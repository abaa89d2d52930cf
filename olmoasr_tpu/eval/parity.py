"""One-command real-weights WER parity harness (VERDICT r1 missing #1).

Given a released ``.pt`` checkpoint (or local file) and optionally the real
``gpt2.tiktoken`` rank file, this script runs everything between "weights
appear" and "WER vs the published baseline":

  1. installs the rank file so the tokenizer uses real GPT-2 BPE,
  2. sanity-checks the tokenizer against known GPT-2 ids,
  3. converts + loads the checkpoint,
  4. short-form LibriSpeech eval (batched greedy, the reference's
     ``scripts/eval/eval.py:1783-1885`` protocol),
  5. one long-form file (sliding windows, beam_size=5/best_of=5, the
     reference's eval.py:2077-2084 config),
  6. freezes golden token sequences (first N eval utterances) as a fixture
     for regression testing,
  7. prints WER next to the published BASELINE.md row for the variant.

Usage (network or pre-downloaded files):
  python -m olmoasr_tpu.eval.parity --ckpt medium.en            # by name
  python -m olmoasr_tpu.eval.parity --ckpt /path/medium.en.pt \
      --ranks /path/gpt2.tiktoken \
      --eval_dir eval_data --eval_set librispeech_clean \
      --long_audio talk.wav --long_ref talk.txt --out_dir parity_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

# published short-form LibriSpeech test-clean/other WER (%) per variant
# (BASELINE.md <- reference README.md:160-161)
PUBLISHED_WER = {
    "tiny.en": {"librispeech_clean": 5.1, "librispeech_other": 12.3},
    "base.en": {"librispeech_clean": 3.7, "librispeech_other": 9.0},
    "small.en": {"librispeech_clean": 3.0, "librispeech_other": 7.0},
    "medium.en": {"librispeech_clean": 3.5, "librispeech_other": 5.7},
    "large.en": {"librispeech_clean": 2.6, "librispeech_other": 5.9},
    "large.en-v2": {"librispeech_clean": 2.7, "librispeech_other": 5.6},
}

# spot ids from the real GPT-2 vocabulary — verifies a provided rank file is
# the genuine article before trusting any WER computed with it
GPT2_KNOWN_IDS = {
    " the": [262],
    " hello": [23748],
    "The": [464],
    " world": [995],
    "a": [64],
}


def check_tokenizer(strict: bool) -> bool:
    from olmoasr_tpu.tokenizer import get_encoding

    enc = get_encoding()
    real = type(enc).__name__ == "BytePairEncoder"
    if not real:
        msg = ("no gpt2.tiktoken rank file found -> byte-fallback tokenizer; "
               "WER is NOT comparable to the baseline")
        if strict:
            raise SystemExit(f"parity: {msg}")
        print(f"parity: WARNING: {msg}")
        return False
    bad = {t: enc.encode(t) for t, ids in GPT2_KNOWN_IDS.items()
           if enc.encode(t) != ids}
    if bad:
        raise SystemExit(
            f"parity: rank file present but ids do not match GPT-2: {bad}"
        )
    print("parity: tokenizer = real GPT-2 BPE (spot ids verified)")
    return True


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="released model name (downloads) or local .pt/.npz")
    ap.add_argument("--variant", default=None,
                    help="variant name for the baseline row (inferred from "
                    "--ckpt when it is a released name)")
    ap.add_argument("--ranks", default=None, help="path to gpt2.tiktoken")
    ap.add_argument("--eval_set", default="librispeech_clean")
    ap.add_argument("--eval_dir", default="eval_data")
    ap.add_argument("--max_samples", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--long_audio", default=None, help="one long-form file")
    ap.add_argument("--long_ref", default=None, help="its reference transcript")
    ap.add_argument("--out_dir", default="parity_out")
    ap.add_argument("--golden_n", type=int, default=8,
                    help="freeze token sequences for the first N utterances")
    ap.add_argument("--allow_fallback_tokenizer", action="store_true")
    args = ap.parse_args(argv)

    if args.ranks:
        os.environ["OLMOASR_TIKTOKEN"] = args.ranks
    real_tok = check_tokenizer(strict=not args.allow_fallback_tokenizer)

    from olmoasr_tpu.api import load_model
    from olmoasr_tpu.eval.harness import (
        long_form_eval_single,
        short_form_eval,
        write_results,
    )

    model = load_model(args.ckpt, inference=True)
    variant = args.variant or (args.ckpt if not os.path.isfile(args.ckpt) else "?")
    os.makedirs(args.out_dir, exist_ok=True)

    # ---- short-form WER ----------------------------------------------------
    result = short_form_eval(
        model, args.eval_set, args.eval_dir,
        batch_size=args.batch_size, max_samples=args.max_samples,
    )
    write_results(result, args.out_dir, ckpt_name=str(variant).replace("/", "_"))
    published = PUBLISHED_WER.get(variant, {}).get(args.eval_set)
    line = (f"parity: short-form {args.eval_set}: WER {result.wer * 100:.2f}% "
            f"({result.n_samples} utts, RTFx {result.rtfx:.0f})")
    if published is not None:
        delta = result.wer * 100 - published
        line += f" | published {published:.1f}% | delta {delta:+.2f}"
    print(line)

    # ---- golden token fixtures ----------------------------------------------
    if args.golden_n and real_tok:
        from olmoasr_tpu.audio import log_mel_spectrogram_np, pad_or_trim
        from olmoasr_tpu.decoding import DecodingOptions
        from olmoasr_tpu.eval.datasets import DatasetFactory
        from olmoasr_tpu.eval.harness import _item_waveform
        import numpy as np

        items = DatasetFactory.create_loader(
            args.eval_set, args.eval_dir
        ).load()[: args.golden_n]
        mels = np.stack([
            log_mel_spectrogram_np(pad_or_trim(_item_waveform(it)))
            for it in items
        ])
        res = model.decode(
            mels, DecodingOptions(language="en", without_timestamps=True)
        )
        golden = {
            it.id: {"tokens": r.tokens, "text": r.text}
            for it, r in zip(items, res)
        }
        gpath = os.path.join(args.out_dir, f"golden_{variant}.json")
        with open(gpath, "w") as f:
            json.dump(golden, f, indent=1)
        print(f"parity: froze {len(golden)} golden sequences -> {gpath} "
              f"(copy into tests/fixtures/ to pin)")

    # ---- long-form ----------------------------------------------------------
    if args.long_audio:
        wer = long_form_eval_single(model, args.long_audio, args.long_ref)
        print(f"parity: long-form {os.path.basename(args.long_audio)}: "
              f"WER {wer * 100:.2f}% (beam_size=5, best_of=5, timestamps)")

    return 0


if __name__ == "__main__":
    sys.exit(main())
