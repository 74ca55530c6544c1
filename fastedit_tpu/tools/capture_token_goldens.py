"""Fill the CLIP token-id golden fixture from a real tokenizer vocab.

Run by ``tools/bring_up.sh`` right after converting the SDXL tokenizer
(round-3 verdict Next #6): encodes the staged PIE-Bench-style prompts in
``tests/fixtures/clip_token_goldens.json`` with the first-party tokenizer
(fastedit_tpu/text/tokenizer.py), cross-checks every encoding against
``transformers.CLIPTokenizer`` loaded from the SAME vocab.json/merges.txt
(the oracle the reference stack uses transitively,
/root/reference/src/pipeline.py:128-135), and writes the ids back into the
fixture so ``tests/test_tokenizer.py::test_real_vocab_goldens`` asserts
them on every subsequent run.

Usage:
    python -m fastedit_tpu.tools.capture_token_goldens \
        --tokenizer_dir checkpoints/tokenizer \
        [--fixture tests/fixtures/clip_token_goldens.json]
"""

from __future__ import annotations

import argparse
import json
import os

from fastedit_tpu.text.tokenizer import CLIPTokenizer

_DEFAULT_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "clip_token_goldens.json",
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tokenizer_dir", required=True,
                    help="converted tokenizer dir (vocab.json + merges.txt)")
    ap.add_argument("--fixture", default=_DEFAULT_FIXTURE)
    args = ap.parse_args(argv)

    with open(args.fixture, encoding="utf-8") as f:
        fx = json.load(f)

    ours = CLIPTokenizer.from_dir(args.tokenizer_dir)
    ids = [ours.encode(p).tolist() for p in fx["prompts"]]

    vocab_file = os.path.join(args.tokenizer_dir, "vocab.json")
    merges_file = os.path.join(args.tokenizer_dir, "merges.txt")
    try:
        from transformers import CLIPTokenizer as HFTok

        hf = HFTok(vocab_file=vocab_file, merges_file=merges_file)
        mismatches = []
        for p, row in zip(fx["prompts"], ids):
            ref = hf(
                p, padding="max_length", max_length=fx["max_length"],
                truncation=True,
            )["input_ids"]
            if row != list(ref):
                mismatches.append((p, row, list(ref)))
        if mismatches:
            for p, got, want in mismatches:
                print(f"[token_goldens] MISMATCH {p!r}\n  ours={got}\n  hf  ={want}")
            return 1
        fx["oracle"] = "transformers.CLIPTokenizer (verified equal)"
    except ImportError:
        fx["oracle"] = "first-party only (transformers unavailable at capture)"

    fx["input_ids"] = ids
    with open(args.fixture, "w", encoding="utf-8") as f:
        json.dump(fx, f, indent=1, ensure_ascii=False)
        f.write("\n")
    print(
        f"[token_goldens] wrote {len(ids)} golden encodings -> {args.fixture} "
        f"(oracle: {fx['oracle']})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
