"""Eval-set downloaders.

Rebuild of ``/root/reference/scripts/eval/get_eval_set.py``: wget/tar for the
classic corpora (eval.py's loaders then parse the extracted trees) and
HF ``datasets`` for the rest, normalized into the JSONL manifest format that
``olmoasr_tpu.eval.datasets.ManifestLoader`` reads.

Network-dependent by nature; every function degrades to a clear error when
offline. LDC-licensed sets (WSJ, HUB5, CORAAL mirrors) must be fetched
manually, like in the reference (get_eval_set.py:615-616 NotImplemented).
"""

from __future__ import annotations

import json
import os
import tarfile
import urllib.request
from typing import Dict, List, Optional

URLS = {
    "librispeech_clean": "https://www.openslr.org/resources/12/test-clean.tar.gz",
    "librispeech_other": "https://www.openslr.org/resources/12/test-other.tar.gz",
    "artie": "https://ml-corpora-artie.s3-us-west-2.amazonaws.com/artie-bias-corpus.tar.gz",
    "tedlium": "https://projets-lium.univ-lemans.fr/wp-content/uploads/corpus/TED-LIUM/TEDLIUM_release-3.tgz",
    "kincaid46": "https://www.rev.com/blog/wp-content/uploads/2020/03/kincaid46.zip",
}

HF_SETS = {
    # eval-set name -> (dataset path, config, split, text column)
    "fleurs": ("google/fleurs", "en_us", "test", "transcription"),
    "voxpopuli": ("facebook/voxpopuli", "en", "test", "normalized_text"),
    "common_voice": ("mozilla-foundation/common_voice_5_1", "en", "test", "sentence"),
    "tedlium_hf": ("LIUM/tedlium", "release3", "test", "text"),
    "ami_ihm": ("edinburghcstr/ami", "ihm", "test", "text"),
    "ami_sdm": ("edinburghcstr/ami", "sdm", "test", "text"),
    "meanwhile": ("distil-whisper/meanwhile", None, "test", "text"),
    "rev16": ("distil-whisper/rev16", "whisper_subset", "test", "transcription"),
    "earnings21": ("distil-whisper/earnings21", "full", "test", "transcription"),
    "earnings22": ("distil-whisper/earnings22", "full", "test", "transcription"),
}


def download_and_extract(url: str, dest_dir: str) -> str:
    os.makedirs(dest_dir, exist_ok=True)
    fname = os.path.join(dest_dir, os.path.basename(url))
    if not os.path.exists(fname):
        print(f"downloading {url}")
        urllib.request.urlretrieve(url, fname)
    if fname.endswith((".tar.gz", ".tgz")):
        with tarfile.open(fname) as tar:
            tar.extractall(dest_dir)
    elif fname.endswith(".zip"):
        import zipfile

        with zipfile.ZipFile(fname) as z:
            z.extractall(dest_dir)
    return dest_dir


def materialize_hf_set(eval_set: str, dest_dir: str, max_samples: Optional[int] = None):
    """Export an HF dataset to wav files + a JSONL manifest (our normalized
    layout; avoids keeping HF/arrow in the eval path)."""
    import numpy as np
    import scipy.io.wavfile as wavfile
    from datasets import load_dataset

    path, config, split, text_col = HF_SETS[eval_set]
    ds = load_dataset(path, config, split=split, trust_remote_code=True)
    os.makedirs(os.path.join(dest_dir, "audio"), exist_ok=True)
    manifest = os.path.join(dest_dir, f"{eval_set}.jsonl")
    with open(manifest, "w", encoding="utf-8") as f:
        for i, row in enumerate(ds):
            if max_samples and i >= max_samples:
                break
            audio = row["audio"]
            rel = os.path.join("audio", f"{eval_set}_{i:06d}.wav")
            arr = np.asarray(audio["array"], dtype=np.float32)
            wavfile.write(
                os.path.join(dest_dir, rel),
                audio["sampling_rate"],
                (arr * 32767).astype(np.int16),
            )
            f.write(json.dumps({"audio": rel, "text": row[text_col], "id": str(i)}) + "\n")
    return manifest


def get_eval_set(eval_set: str, eval_dir: str, max_samples: Optional[int] = None) -> str:
    """Fetch + normalize one eval set under ``eval_dir`` (get_eval_set.py:92)."""
    dest = os.path.join(eval_dir, eval_set)
    if eval_set in URLS:
        return download_and_extract(URLS[eval_set], dest)
    if eval_set in HF_SETS:
        materialize_hf_set(eval_set, dest, max_samples)
        return dest
    if eval_set in ("wsj", "callhome", "switchboard", "chime6", "coraal"):
        raise NotImplementedError(
            f"{eval_set} requires a manual (LDC/licensed) download; place the "
            f"corpus under {dest} in its standard layout"
        )
    raise ValueError(f"unknown eval set: {eval_set}")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--eval_set", required=True)
    p.add_argument("--eval_dir", required=True)
    p.add_argument("--max_samples", type=int, default=None)
    a = p.parse_args()
    get_eval_set(a.eval_set, a.eval_dir, a.max_samples)
