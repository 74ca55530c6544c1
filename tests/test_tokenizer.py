"""Tokenizer golden test vs transformers.CLIPTokenizer on a synthetic vocab
(the real vocab.json/merges.txt ship with converted checkpoints; no network
here).  Both tokenizers load the same local files, outputs must match."""

import json

import numpy as np
import pytest

from fastedit_tpu.text.tokenizer import CLIPTokenizer, bytes_to_unicode


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    chars = list(bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = [
        "t h",
        "th e</w>",
        "c a",
        "ca t</w>",
        "d o",
        "do g</w>",
        "i n</w>",
        "a</w> b",  # never applicable; exercises rank parsing
    ]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(d)


def test_roundtrip(vocab_dir):
    tok = CLIPTokenizer.from_dir(vocab_dir)
    ids = tok.encode("the cat in the hat")
    assert ids.shape == (77,)
    assert ids[0] == tok.bos_token_id
    assert tok.eos_token_id in ids
    assert tok.decode(ids.tolist()) == "the cat in the hat"


def test_matches_transformers(vocab_dir):
    from transformers import CLIPTokenizer as HFTok

    hf = HFTok(
        vocab_file=f"{vocab_dir}/vocab.json", merges_file=f"{vocab_dir}/merges.txt"
    )
    ours = CLIPTokenizer.from_dir(vocab_dir)
    for text in [
        "the cat in the hat",
        "The DOG   and the cat!",
        "a photo of a cat, 4k",
        "",
        "don't do that",
    ]:
        ref = hf(
            text,
            padding="max_length",
            max_length=77,
            truncation=True,
        )["input_ids"]
        got = ours.encode(text)
        np.testing.assert_array_equal(got, np.asarray(ref), err_msg=text)


def test_pad_token_override(vocab_dir):
    tok = CLIPTokenizer.from_dir(vocab_dir, pad_token_id=0)
    ids = tok.encode("cat")
    assert ids[-1] == 0
    assert ids[2] == tok.eos_token_id
