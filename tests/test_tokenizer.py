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
        # round-3 verdict Weak #5: Unicode-class divergence cases.
        "snake_case_name and __dunder__",  # `_` must NOT be letter-class
        "x2y 123 no.4",                    # digits split one at a time
        "half ½ and roman Ⅴ",    # No / Nl number chars
        "café näive",            # non-ASCII letters stay letter runs
        "it's 'tis y'all can't!!",         # contraction alternations
        "a--b ... !<|x|> '' 'q",           # greedy punctuation runs
        "你好 world",              # CJK letter run
        # BasicTokenizer drops ALL category-C chars, not just Cc/Cf:
        "ab",                # Co private-use removed -> "ab"
        "pre\U000e0065\U000e006epost",  # Cf tag chars removed
        "tab\tand\nnewline\rkept as spaces",
        # literal special tokens emit their single id, not byte-BPE pieces
        "a photo <|endoftext|> trailing",
        "<|startoftext|> b",
    ]:
        ref = hf(
            text,
            padding="max_length",
            max_length=77,
            truncation=True,
        )["input_ids"]
        got = ours.encode(text)
        np.testing.assert_array_equal(got, np.asarray(ref), err_msg=text)


def test_real_vocab_goldens():
    """Assert the staged real-vocab golden encodings once bring_up.sh has
    filled them (tools/capture_token_goldens.py); skip while unfilled."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixture = os.path.join(repo, "tests", "fixtures", "clip_token_goldens.json")
    with open(fixture, encoding="utf-8") as f:
        fx = json.load(f)
    if fx.get("input_ids") is None:
        pytest.skip(
            "token goldens not captured yet — requires the real CLIP vocab "
            "(tools/bring_up.sh on a machine with egress)"
        )
    tok_dir = os.path.join(repo, "checkpoints", "tokenizer")
    if not os.path.exists(os.path.join(tok_dir, "vocab.json")):
        pytest.skip("converted tokenizer checkpoint not present")
    tok = CLIPTokenizer.from_dir(tok_dir)
    for prompt, want in zip(fx["prompts"], fx["input_ids"]):
        np.testing.assert_array_equal(
            tok.encode(prompt), np.asarray(want, dtype=np.int32), err_msg=prompt
        )


def test_capture_tool_roundtrip(vocab_dir, tmp_path):
    """capture_token_goldens fills a fixture and the ids agree with the HF
    oracle over the same (synthetic) vocab files."""
    from fastedit_tpu.tools import capture_token_goldens as cap

    fixture = tmp_path / "goldens.json"
    fixture.write_text(json.dumps({
        "prompts": ["the cat", "a dog's 2nd bone_toy"],
        "max_length": 77,
        "input_ids": None,
        "oracle": None,
    }))
    rc = cap.main(["--tokenizer_dir", vocab_dir, "--fixture", str(fixture)])
    assert rc == 0
    fx = json.loads(fixture.read_text())
    assert fx["oracle"].startswith("transformers.CLIPTokenizer")
    assert len(fx["input_ids"]) == 2
    assert all(len(row) == 77 for row in fx["input_ids"])


def test_pad_token_override(vocab_dir):
    tok = CLIPTokenizer.from_dir(vocab_dir, pad_token_id=0)
    ids = tok.encode("cat")
    assert ids[-1] == 0
    assert ids[2] == tok.eos_token_id


def test_decode_preserves_vocab_id_zero(vocab_dir):
    """bigG pads with id 0, which is also a real vocab id: decode must cut
    padding at EOS rather than filter the pad id out of the text."""
    tok = CLIPTokenizer.from_dir(vocab_dir, pad_token_id=0)
    zero_char = tok.decoder[0]  # the vocab token with id 0
    ids = [tok.bos_token_id, 0, 0, tok.eos_token_id, 0, 0, 0]
    out = tok.decode(ids)
    assert zero_char * 2 in out.replace(" ", "")
