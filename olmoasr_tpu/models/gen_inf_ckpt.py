"""Training -> inference checkpoint conversion (CLI).

Parity with ``/root/reference/scripts/eval/gen_inf_ckpt.py``: strip the
padding-token embedding row (id 51864) so the inference model's vocab is
exactly 51864. Accepts reference ``.pt`` or native ``.npz`` checkpoints.
"""

from __future__ import annotations

from olmoasr_tpu.models.convert import (
    load_npz_checkpoint,
    load_torch_checkpoint,
    save_npz_checkpoint,
    strip_padding_row,
)


def gen_inf_ckpt(ckpt_path: str, save_path: str) -> str:
    if ckpt_path.endswith(".npz"):
        params, dims = load_npz_checkpoint(ckpt_path)
        params = strip_padding_row(params)
    else:
        params, dims = load_torch_checkpoint(ckpt_path, inference=True)
    save_npz_checkpoint(save_path, params, dims)
    return save_path


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("ckpt_path")
    p.add_argument("save_path")
    a = p.parse_args()
    gen_inf_ckpt(a.ckpt_path, a.save_path)
