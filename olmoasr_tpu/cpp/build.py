"""Build the native C++ cores (g++ -O3 -shared). Idempotent; called lazily by
``olmoasr_tpu.tokenizer_native`` or manually: ``python -m olmoasr_tpu.cpp.build``."""

from __future__ import annotations

import os
import shutil
import subprocess

CPP_DIR = os.path.dirname(os.path.abspath(__file__))

TARGETS = {
    "libbpe.so": ["bpe.cpp"],
}


def build(force: bool = False) -> dict:
    """Compile all native targets; returns {target: path or None}."""
    out = {}
    gxx = shutil.which("g++")
    for target, sources in TARGETS.items():
        so_path = os.path.join(CPP_DIR, target)
        srcs = [os.path.join(CPP_DIR, s) for s in sources]
        if (
            not force
            and os.path.isfile(so_path)
            and all(os.path.getmtime(so_path) >= os.path.getmtime(s) for s in srcs)
        ):
            out[target] = so_path
            continue
        if gxx is None:
            out[target] = None
            continue
        cmd = [gxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-o", so_path, *srcs]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            out[target] = so_path
        except subprocess.CalledProcessError as e:
            print(f"native build failed for {target}:\n{e.stderr.decode()}")
            out[target] = None
    return out


if __name__ == "__main__":
    print(build(force=True))
