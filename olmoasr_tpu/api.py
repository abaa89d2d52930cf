"""Public API: ``load_model`` and the ``OLMoASR`` model object.

Parity with ``/root/reference/olmoasr/__init__.py:97-166`` — name→URL resolve,
download+cache, checkpoint load, model construction — with one model class
instead of the reference's separate training/inference modules (our single
functional model handles both; ``inference`` controls the padding-row strip).
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
import warnings
from typing import Dict, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from olmoasr_tpu.models import convert as convert_mod
from olmoasr_tpu.models import whisper as model_mod
from olmoasr_tpu.models.dims import VARIANT_TO_DIMS, ModelDimensions


def _download(url: str, root: str) -> str:
    os.makedirs(root, exist_ok=True)
    target = os.path.join(root, os.path.basename(url))
    if os.path.isfile(target):
        return target
    with urllib.request.urlopen(url) as source, open(target, "wb") as output:
        while True:
            buffer = source.read(8192)
            if not buffer:
                break
            output.write(buffer)
    return target


class OLMoASR:
    """Model handle: params + dims + bound inference/training entry points.

    Mirrors the reference ``OLMoASR`` module API (model.py:778-968):
    ``transcribe``, ``decode``, ``detect_language``, ``embed_audio``,
    ``logits``, ``forward``, ``is_multilingual``, ``num_languages``.
    """

    def __init__(
        self,
        dims: ModelDimensions,
        params: Optional[model_mod.Params] = None,
        *,
        inference: bool = True,
        seed: int = 0,
        param_dtype=jnp.float32,
    ):
        self.dims = dims
        self.inference = inference
        if params is None:
            params = model_mod.init_params(
                jax.random.PRNGKey(seed),
                dims,
                include_padding_token=not inference,
                dtype=param_dtype,
            )
        self.params = params

    # -- properties ---------------------------------------------------------
    @property
    def is_multilingual(self) -> bool:
        return self.dims.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        return self.dims.n_vocab - 51765 - int(self.is_multilingual)

    @property
    def device(self):
        return jax.devices()[0]

    def num_params(self) -> int:
        return model_mod.num_params(self.params)

    def astype(self, dtype) -> "OLMoASR":
        self.params = jax.tree.map(lambda x: x.astype(dtype), self.params)
        return self

    # alias matching torch's .half()
    def half(self) -> "OLMoASR":
        return self.astype(jnp.bfloat16)

    # -- forward entry points -------------------------------------------------
    def embed_audio(self, mel: jax.Array) -> jax.Array:
        return model_mod.encode_audio(self.params, self.dims, mel)

    def logits(self, tokens: jax.Array, audio_features: jax.Array) -> jax.Array:
        return model_mod.decode_train(self.params, self.dims, tokens, audio_features)

    def forward(
        self,
        mel: jax.Array,
        tokens: jax.Array,
        padding_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        return model_mod.forward_train(
            self.params, self.dims, mel, tokens, padding_mask
        )

    __call__ = forward

    # -- bound high-level functions (model.py:966-968 parity) ---------------
    def decode(self, mel, options=None, **kwargs):
        from olmoasr_tpu import decoding

        if options is None:
            options = decoding.DecodingOptions(**kwargs)
        return decoding.decode(self.params, self.dims, mel, options)

    def transcribe(self, audio, **kwargs):
        from olmoasr_tpu import transcribe as transcribe_mod

        return transcribe_mod.transcribe(self, audio, **kwargs)

    def detect_language(self, mel):
        from olmoasr_tpu import decoding

        return decoding.detect_language(self.params, self.dims, mel)


def load_model(
    name: str,
    device: Optional[str] = None,
    download_root: Optional[str] = None,
    inference: bool = True,
    in_memory: bool = False,
) -> OLMoASR:
    """Load an OLMoASR model by released name, local ``.pt``, or native ``.npz``.

    Signature parity with ``/root/reference/olmoasr/__init__.py:97``; ``device``
    and ``in_memory`` are accepted for compatibility (JAX manages placement).
    """
    from olmoasr_tpu import MODEL2LINK

    if download_root is None:
        default = os.path.join(os.path.expanduser("~"), ".cache")
        download_root = os.path.join(
            os.getenv("XDG_CACHE_HOME", default), "olmoasr"
        )

    if name in MODEL2LINK:
        path = _download(MODEL2LINK[name], download_root)
    elif os.path.isfile(name):
        path = name
    else:
        raise RuntimeError(
            f"Model {name} not found; available models = {list(MODEL2LINK)}"
        )

    if path.endswith(".npz"):
        params, dims = convert_mod.load_npz_checkpoint(path)
        if inference:
            params = convert_mod.strip_padding_row(params)
    else:
        params, dims = convert_mod.load_torch_checkpoint(path, inference=inference)
    return OLMoASR(dims, params, inference=inference)


def build_model(
    variant: str, *, inference: bool = True, seed: int = 0, param_dtype=jnp.float32
) -> OLMoASR:
    """Random-init model by variant name (for training / benchmarks)."""
    dims = VARIANT_TO_DIMS[variant]
    return OLMoASR(dims, inference=inference, seed=seed, param_dtype=param_dtype)
