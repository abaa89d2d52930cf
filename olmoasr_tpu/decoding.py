"""On-device decoding: greedy / temperature sampling / beam search with
whisper-compatible logit filters and scoring.

Native rebuild of ``[pip:whisper] decoding.DecodingTask`` (bound to the model at
``/root/reference/olmoasr/model.py:9,966-968`` and driven by
``olmoasr/transcribe.py:193-233`` and ``scripts/eval/eval.py:1845-1847``).

TPU-first design, instead of the reference's per-token Python loop:

  * the whole autoregressive loop is ONE ``lax.scan`` with a fixed 224-step
    bound, compiled once and kept on device; finished sequences are masked,
    not exited early (XLA has no data-dependent early exit);
  * logit filters (suppress-blank, suppress-tokens, timestamp rules) are
    vectorized jnp transforms over (B, vocab) logits driven by the carried
    token ring — no host round-trips inside the loop;
  * beams are an extra batch dimension (B*beam) so beam search is the same
    compiled program shape as batched greedy;
  * temperature is a traced scalar: the 0→1.0 fallback ladder of
    ``transcribe.py:193-233`` re-uses one compiled program.

Host work per ``decode()`` call: tokenizer decode + gzip compression ratio.
"""

from __future__ import annotations

import functools
import os
import zlib
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from olmoasr_tpu import audio as audio_mod
from olmoasr_tpu.models import whisper as model_mod
from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.tokenizer import LANGUAGES, Tokenizer, get_tokenizer


@dataclass(frozen=True)
class DecodingOptions:
    """Mirror of whisper's DecodingOptions (README.md:193-247 result schema)."""

    task: str = "transcribe"
    language: Optional[str] = None

    temperature: float = 0.0
    sample_len: Optional[int] = None  # maximum tokens to sample
    best_of: Optional[int] = None  # number of independent samples (t > 0)
    beam_size: Optional[int] = None  # beams (t == 0)
    patience: Optional[float] = None  # beam patience

    length_penalty: Optional[float] = None

    prompt: Optional[Union[str, List[int]]] = None
    prefix: Optional[Union[str, List[int]]] = None

    suppress_tokens: Optional[Union[str, Sequence[int]]] = "-1"
    suppress_blank: bool = True

    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0

    fp16: bool = True  # interpreted as bf16 on TPU

    # TPU-specific performance knobs (no reference equivalent):
    # int8-quantize the cross-attention K/V cache — the decode loop's dominant
    # HBM traffic — per-row scales, ~2x decode throughput, negligible WER
    # impact. Off by default for exact-parity runs.
    kv_quant: bool = False


@dataclass(frozen=True)
class DecodingResult:
    audio_features: Optional[jax.Array] = None
    language: str = "en"
    language_probs: Optional[Dict[str, float]] = None
    tokens: List[int] = field(default_factory=list)
    text: str = ""
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = np.nan
    compression_ratio: float = np.nan


def compression_ratio(text: str) -> float:
    text_bytes = text.encode("utf-8")
    if len(text_bytes) == 0:
        return 0.0
    return len(text_bytes) / len(zlib.compress(text_bytes))


# ---------------------------------------------------------------------------
# logit filters (vectorized; applied inside the scan step)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FilterConfig:
    """Static data for the on-device filters, precomputed host-side."""

    sample_begin: int
    eot: int
    timestamp_begin: int
    no_timestamps: int
    blank_suppress: Tuple[int, ...]  # (" " ids + eot) for SuppressBlank
    suppress: Tuple[int, ...]  # SuppressTokens list
    apply_timestamp_rules: bool
    max_initial_timestamp_index: Optional[int]
    n_vocab: int

    @functools.cached_property
    def suppress_mask(self) -> np.ndarray:
        m = np.zeros((self.n_vocab,), np.float32)
        m[list(self.suppress)] = -np.inf
        return m

    @functools.cached_property
    def blank_mask(self) -> np.ndarray:
        m = np.zeros((self.n_vocab,), np.float32)
        m[list(self.blank_suppress)] = -np.inf
        return m


def build_filter_config(
    tokenizer: Tokenizer,
    options: DecodingOptions,
    sample_begin: int,
    n_vocab: int,
    n_frames_content: Optional[int] = None,
) -> FilterConfig:
    """Replicates DecodingTask._get_suppress_tokens + filter setup."""
    suppress = options.suppress_tokens
    if isinstance(suppress, str):
        suppress = [int(t) for t in suppress.split(",")] if suppress else []
    else:
        suppress = list(suppress) if suppress is not None else []
    if -1 in suppress:
        suppress = [t for t in suppress if t >= 0]
        suppress.extend(tokenizer.non_speech_tokens)
    suppress.extend(
        [tokenizer.transcribe, tokenizer.translate, tokenizer.sot,
         tokenizer.sot_prev, tokenizer.sot_lm]
    )
    if tokenizer.no_speech is not None:
        suppress.append(tokenizer.no_speech)
    suppress = tuple(sorted(set(suppress)))

    precision = 0.02
    max_initial_timestamp_index = None
    if options.max_initial_timestamp is not None:
        max_initial_timestamp_index = round(options.max_initial_timestamp / precision)

    blank = tuple(tokenizer.encode(" ") + [tokenizer.eot])

    return FilterConfig(
        sample_begin=sample_begin,
        eot=tokenizer.eot,
        timestamp_begin=tokenizer.timestamp_begin,
        no_timestamps=tokenizer.no_timestamps,
        blank_suppress=blank if options.suppress_blank else (),
        suppress=suppress,
        apply_timestamp_rules=not options.without_timestamps,
        max_initial_timestamp_index=max_initial_timestamp_index,
        n_vocab=n_vocab,
    )


def apply_filters(
    logits: jax.Array,  # (B, V) fp32
    tokens: jax.Array,  # (B, max_len) sampled-token ring (eot-padded)
    step: jax.Array,  # scalar: number of tokens sampled so far
    cfg: FilterConfig,
) -> jax.Array:
    """All whisper logit filters, vectorized (SuppressBlank, SuppressTokens,
    ApplyTimestampRules — [pip:whisper] decoding.py semantics)."""
    V = logits.shape[-1]
    logits = logits + jnp.asarray(cfg.suppress_mask)

    if cfg.blank_suppress:
        logits = jnp.where(
            step == 0, logits + jnp.asarray(cfg.blank_mask), logits
        )

    if not cfg.apply_timestamp_rules:
        # timestamps entirely suppressed in without_timestamps mode via the
        # no_timestamps token in the prompt; also mask them here for safety
        ts_mask = (jnp.arange(V) >= cfg.timestamp_begin) | (
            jnp.arange(V) == cfg.no_timestamps
        )
        return jnp.where(ts_mask[None, :], -jnp.inf, logits)

    ts_begin = cfg.timestamp_begin
    ids = jnp.arange(V)
    is_ts = ids >= ts_begin  # (V,)
    is_text = ids < cfg.eot

    # carried-token views (positions >= step are eot padding)
    B, L = tokens.shape
    pos = jnp.arange(L)
    valid = pos[None, :] < step  # (B, L) - same step for all rows

    last_tok = jnp.where(step > 0, tokens[:, jnp.maximum(step - 1, 0)], -1)
    penult_tok = jnp.where(step > 1, tokens[:, jnp.maximum(step - 2, 0)], -1)
    last_was_ts = (step >= 1) & (last_tok >= ts_begin)
    penult_was_ts = (step < 2) | (penult_tok >= ts_begin)

    # rule 1: after ts+ts -> no timestamps; after text+ts -> no text
    mask_ts = last_was_ts & penult_was_ts  # cannot emit 3rd consecutive ts
    mask_text = last_was_ts & ~penult_was_ts  # must emit closing ts
    logits = jnp.where(
        (mask_ts[:, None] & is_ts[None, :]) | (mask_text[:, None] & is_text[None, :]),
        -jnp.inf,
        logits,
    )
    # no_timestamps token is never sampled
    logits = logits.at[:, cfg.no_timestamps].set(-jnp.inf)

    # rule 2: timestamps are monotonic. Find last timestamp sampled.
    tok_is_ts = (tokens >= ts_begin) & valid
    # last timestamp value per row (0 if none)
    last_ts_val = jnp.max(
        jnp.where(tok_is_ts, tokens, 0), axis=1
    )  # timestamps only increase, so max == last
    have_ts = jnp.any(tok_is_ts, axis=1)
    # if last token was a timestamp, allow repeating it (for the t,t boundary);
    # otherwise the next timestamp must be strictly larger
    floor_ts = jnp.where(last_was_ts, last_ts_val, last_ts_val + 1)
    ts_too_small = (ids[None, :] >= ts_begin) & (ids[None, :] < floor_ts[:, None])
    logits = jnp.where(have_ts[:, None] & ts_too_small, -jnp.inf, logits)

    # rule 3: at the very first sample position, force a timestamp token
    first = step == 0
    non_ts = ids < ts_begin
    logits = jnp.where(first & non_ts[None, :], -jnp.inf, logits)
    if cfg.max_initial_timestamp_index is not None:
        last_allowed = ts_begin + cfg.max_initial_timestamp_index
        logits = jnp.where(first & (ids > last_allowed)[None, :], -jnp.inf, logits)

    # rule 4: if total timestamp probability outweighs any single text token,
    # sample a timestamp
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts[None, :], logprobs, -jnp.inf), axis=-1
    )
    # max over ALL non-timestamp ids (incl. eot): [pip:whisper]
    # ApplyTimestampRules uses logprobs[: timestamp_begin].max(), so EOT can
    # win and end the segment instead of forcing a timestamp.
    max_text_logprob = jnp.max(
        jnp.where(non_ts[None, :], logprobs, -jnp.inf), axis=-1
    )
    force_ts = ts_logprob > max_text_logprob
    logits = jnp.where(force_ts[:, None] & ~is_ts[None, :], -jnp.inf, logits)
    return logits


# ---------------------------------------------------------------------------
# greedy / sampling loop
# ---------------------------------------------------------------------------


def _greedy_step(carry, i, params, dims, cfg, temperature, greedy_only):
    """One sampling step (scan body — no cond: a data-dependent branch here
    makes XLA copy the whole carry, cache included, at the join every step)."""
    cache, tokens, finished, sum_logprobs, logits, rng = carry
    eot = cfg.eot
    rng, sub = jax.random.split(rng)
    filt = apply_filters(logits, tokens, i, cfg)
    greedy_tok = jnp.argmax(filt, axis=-1)
    if greedy_only:
        # statically temperature==0: skip the gumbel/categorical computation
        tok = greedy_tok.astype(jnp.int32)
    else:
        sampled_tok = jax.random.categorical(
            sub, filt / jnp.maximum(temperature, 1e-6), axis=-1
        )
        tok = jnp.where(temperature > 0, sampled_tok, greedy_tok).astype(jnp.int32)
    tok = jnp.where(finished, eot, tok)
    logprobs = jax.nn.log_softmax(filt, axis=-1)
    tok_logprob = jnp.take_along_axis(logprobs, tok[:, None], axis=1)[:, 0]
    sum_logprobs = sum_logprobs + jnp.where(finished, 0.0, tok_logprob)
    tokens = jax.lax.dynamic_update_slice_in_dim(tokens, tok[:, None], i, axis=1)
    finished = finished | (tok == eot)
    next_logits, cache = model_mod.decode_step(params, dims, tok[:, None], cache)
    return (cache, tokens, finished, sum_logprobs, next_logits[:, 0], rng)


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "cfg", "prompt_len", "sample_len", "sot_index", "compute_dtype",
        "kv_quant",
    ),
)
def _decode_prefill_jit(
    params,
    dims: ModelDimensions,
    mel: jax.Array,  # (B, n_mels, 3000)
    prompt: jax.Array,  # (B, prompt_len)
    cfg: FilterConfig,
    prompt_len: int,
    sample_len: int,
    sot_index: int,
    rng: jax.Array,
    compute_dtype=jnp.bfloat16,
    kv_quant: bool = False,
):
    """Encoder + prompt prefill; returns the decode carry + diagnostics.

    ``prompt`` may carry ``n_groups = prompt_rows / mel_rows`` token rows per
    audio window (best_of sampling): the encoder runs ONCE per window and the
    groups share the cross K/V cache (decode_step kv_group indexing) — the
    reference re-encodes and replicates per sample.
    """
    audio_features = model_mod.encode_audio(
        params, dims, mel, compute_dtype=compute_dtype
    )
    # self rings stay bf16: int8-quantizing them measured SLOWER (715 vs 782
    # RTFx — per-step quantization + scale-ring traffic outweighs the small
    # ring-read saving); the capability stays in init_cache/the kernel.
    cache = model_mod.init_cache(
        params, dims, audio_features, max_len=prompt_len + sample_len,
        quantize_cross=kv_quant, self_batch=prompt.shape[0],
    )
    logits_all, cache = model_mod.decode_step(params, dims, prompt, cache)
    # no_speech prob is measured at the sot position ([pip:whisper]
    # decoding.DecodingTask._main_loop)
    probs_at_sot = jax.nn.softmax(
        logits_all[:, sot_index].astype(jnp.float32), axis=-1
    )
    first_logits = logits_all[:, -1].astype(jnp.float32)
    B = prompt.shape[0]
    carry = (
        cache,
        jnp.full((B, sample_len), cfg.eot, jnp.int32),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.float32),
        first_logits,
        rng,
    )
    return carry, probs_at_sot, audio_features


@functools.partial(
    jax.jit,
    static_argnames=("dims", "cfg", "chunk", "greedy_only", "compute_dtype"),
    donate_argnames=("carry",),
)
def _decode_chunk_jit(
    params,
    dims: ModelDimensions,
    carry,
    start: jax.Array,  # scalar: steps sampled so far
    cfg: FilterConfig,
    chunk: int,
    temperature: jax.Array,
    greedy_only: bool = False,
    compute_dtype=jnp.bfloat16,
):
    """``chunk`` sampling steps as one plain scan (donated carry -> in-place)."""
    def body(c, j):
        return _greedy_step(
            c, start + j, params, dims, cfg, temperature, greedy_only
        ), None

    carry, _ = jax.lax.scan(body, carry, jnp.arange(chunk))
    return carry


def _decode_greedy_jit(
    params,
    dims: ModelDimensions,
    mel: jax.Array,
    prompt: jax.Array,
    cfg: FilterConfig,
    sample_len: int,
    prompt_len: int,
    sot_index: int,
    temperature: jax.Array,
    rng: jax.Array,
    compute_dtype=jnp.bfloat16,
    kv_quant: bool = False,
    chunk: Optional[int] = None,
):
    """Encoder + prefill + chunked sampling with host-side early exit.

    The loop runs in ``chunk``-step compiled scans; between chunks the host
    reads only the (B,) ``finished`` flags and stops dispatching when every
    sequence has emitted eot — the early exit the reference's per-token Python
    loop gets for free (with real weights a 30s window finishes in 40-100 of
    the 224 max steps). Device arrays never leave the chip; carries are
    donated so the cache updates in place.
    """
    carry, probs_at_sot, audio_features = _decode_prefill_jit(
        params, dims, mel, prompt, cfg, prompt_len, sample_len, sot_index, rng,
        compute_dtype, kv_quant,
    )
    greedy_only = bool(np.asarray(temperature) == 0.0)
    if chunk is None:
        # granularity of the host early-exit sync; on high-latency links
        # (axon tunnel) fewer, larger chunks cut per-decode round trips
        chunk = int(os.environ.get("OLMOASR_DECODE_CHUNK", "32"))
    n_chunks = (sample_len + chunk - 1) // chunk
    for c in range(n_chunks):
        steps = min(chunk, sample_len - c * chunk)
        carry = _decode_chunk_jit(
            params, dims, carry, jnp.int32(c * chunk), cfg, steps, temperature,
            greedy_only=greedy_only, compute_dtype=compute_dtype,
        )
        finished = np.asarray(carry[2])
        if finished.all():
            break
    _, tokens, _, sum_logprobs, _, _ = carry
    return tokens, sum_logprobs, probs_at_sot, audio_features


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------


_BEAM_NEG = -1e30


def _beam_step(carry, i, params, dims, cfg, B, K):
    """One beam-search step (whisper BeamSearchDecoder semantics: per audio,
    the K best unfinished hypotheses continue; eot candidates fill a
    ``max_candidates = round(K * patience)``-slot finished pool — the pool
    size is set by the caller via the fin_* carry shapes)."""
    V = dims.n_vocab
    eot = cfg.eot
    NEG = jnp.float32(_BEAM_NEG)
    cache, tokens, beam_lp, fin_tokens, fin_lp, logits, anc = carry
    n_fin = fin_lp.shape[1]  # = max_candidates
    # tokens: (B*K, sample_len); beam_lp: (B, K); logits: (B*K, V)
    filt = apply_filters(logits, tokens, i, cfg)  # (B*K, V)
    logprobs = jax.nn.log_softmax(filt, axis=-1)
    cand = beam_lp[:, :, None] + logprobs.reshape(B, K, V)  # (B, K, V)
    # on the first step all beams are identical; keep only beam 0
    cand = jnp.where((i == 0) & (jnp.arange(K)[None, :, None] > 0), NEG, cand)
    flat = cand.reshape(B, K * V)
    # take top 2K candidates so eot-finishing beams don't starve the beam
    top_lp, top_idx = jax.lax.top_k(flat, 2 * K)  # (B, 2K)
    src_beam = top_idx // V  # (B, 2K)
    tok = (top_idx % V).astype(jnp.int32)
    is_eot = tok == eot

    # --- finished pool update: merge existing K with the eot candidates ----
    eot_lp = jnp.where(is_eot, top_lp, NEG)
    merged_lp = jnp.concatenate([fin_lp, eot_lp], axis=1)  # (B, 3K)
    src_tokens = jnp.take_along_axis(
        tokens.reshape(B, K, -1), src_beam[:, :, None], axis=1
    )  # (B, 2K, sample_len)
    cand_fin_tokens = jnp.where(
        (jnp.arange(src_tokens.shape[-1]) == i)[None, None, :], eot, src_tokens
    )
    merged_tokens = jnp.concatenate([fin_tokens, cand_fin_tokens], axis=1)
    best_fin_lp, best_fin_idx = jax.lax.top_k(merged_lp, n_fin)
    fin_tokens = jnp.take_along_axis(merged_tokens, best_fin_idx[:, :, None], axis=1)
    fin_lp = best_fin_lp

    # --- live beam update: best K non-eot candidates continue --------------
    live_lp = jnp.where(is_eot, NEG, top_lp)
    best_live_lp, best_live_idx = jax.lax.top_k(live_lp, K)  # (B, K)
    live_beam = jnp.take_along_axis(src_beam, best_live_idx, axis=1)
    live_tok = jnp.take_along_axis(tok, best_live_idx, axis=1)

    # reorder the (tiny) token history by source beam; the self RINGS are
    # never physically reordered — the per-(beam, position) ancestry map is
    # permuted instead and the self-attention kernel gathers rows in VMEM
    # (_self_decode_kernel_beam; at small.en B=32 K=5 the physical reorder of
    # the (12, 160, 226, 768) rings measured ~8.4ms/step — a third of the
    # beam step). Cross K/V rows are per-window and permutation-invariant.
    gather_rows = (jnp.arange(B)[:, None] * K + live_beam).reshape(-1)
    tokens = tokens[gather_rows]
    tokens = tokens.at[:, i].set(live_tok.reshape(-1))
    C = anc.shape[-1]
    anc3 = jnp.take_along_axis(
        anc.reshape(B, K, C), live_beam[:, :, None], axis=1
    )
    # positions not yet written stay identity: this step's kv is computed
    # from the (already reordered) token and written to the beam's OWN row
    pos = jnp.arange(C, dtype=jnp.int32)
    anc3 = jnp.where(
        pos[None, None, :] >= cache.index,
        jnp.arange(K, dtype=jnp.int32)[None, :, None],
        anc3,
    )
    anc = anc3.reshape(B * K, C)
    beam_lp = best_live_lp
    next_logits, cache = model_mod.decode_step(
        params, dims, live_tok.reshape(-1, 1), cache, beam_anc=anc
    )
    return (cache, tokens, beam_lp, fin_tokens, fin_lp, next_logits[:, 0], anc)


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "cfg", "sample_len", "prompt_len", "beam_size", "sot_index",
        "compute_dtype", "kv_quant", "max_candidates",
    ),
)
def _beam_prefill_jit(
    params, dims, mel, prompt, cfg, sample_len, prompt_len, beam_size,
    sot_index, compute_dtype=jnp.bfloat16, kv_quant: bool = False,
    max_candidates: Optional[int] = None,
):
    B, K = mel.shape[0], beam_size
    n_fin = max_candidates or K
    audio_features = model_mod.encode_audio(
        params, dims, mel, compute_dtype=compute_dtype
    )
    # cross K/V stored ONCE per audio window; the K beams (self rings, token
    # rows) share it via decode_step's kv_group indexing. The reference (and
    # r2) replicated the cross cache per beam — 5x the dominant HBM bytes of
    # the decode loop at the eval config's beam_size=5 (eval.py:2077-2084).
    cache = model_mod.init_cache(
        params, dims, audio_features, max_len=prompt_len + sample_len,
        quantize_cross=kv_quant, self_batch=B * K,
    )
    prompt_k = jnp.repeat(prompt, K, axis=0)
    logits_all, cache = model_mod.decode_step(params, dims, prompt_k, cache)
    probs_at_sot = jax.nn.softmax(
        logits_all[::K, sot_index].astype(jnp.float32), axis=-1
    )
    first_logits = logits_all[:, -1].astype(jnp.float32)
    # ancestry map: identity at prefill (every row wrote its own prompt kv);
    # _beam_step permutes it instead of physically reordering the self rings
    n_ctx = cache.self_k.shape[2]
    anc = jnp.broadcast_to(
        (jnp.arange(B * K, dtype=jnp.int32) % K)[:, None], (B * K, n_ctx)
    )
    carry = (
        cache,
        jnp.full((B * K, sample_len), cfg.eot, jnp.int32),
        jnp.zeros((B, K), jnp.float32),
        jnp.full((B, n_fin, sample_len), cfg.eot, jnp.int32),
        jnp.full((B, n_fin), jnp.float32(_BEAM_NEG)),
        first_logits,
        anc,
    )
    return carry, probs_at_sot, audio_features


@functools.partial(
    jax.jit,
    static_argnames=("dims", "cfg", "chunk", "B", "K"),
    donate_argnames=("carry",),
)
def _beam_chunk_jit(params, dims, carry, start, cfg, chunk, B, K):
    def body(c, j):
        return _beam_step(c, start + j, params, dims, cfg, B, K), None

    carry, _ = jax.lax.scan(body, carry, jnp.arange(chunk))
    return carry


def _decode_beam_jit(
    params,
    dims: ModelDimensions,
    mel: jax.Array,  # (B, n_mels, 3000)
    prompt: jax.Array,  # (B, prompt_len)
    cfg: FilterConfig,
    sample_len: int,
    prompt_len: int,
    beam_size: int,
    sot_index: int,
    rng: jax.Array,
    compute_dtype=jnp.bfloat16,
    chunk: int = 32,
    patience: Optional[float] = None,
    kv_quant: bool = False,
):
    """Chunked beam search with host-side early exit: stop dispatching once
    every audio has a full finished pool whose worst score beats the best
    live beam (no live continuation can still enter the pool). ``patience``
    sizes the pool: max_candidates = round(K * patience) ([pip:whisper]
    BeamSearchDecoder).

    Returns: tokens (B, max_candidates+K, L), their logprobs,
    no_speech probs (B,), audio_features.
    """
    B, K = mel.shape[0], beam_size
    max_candidates = max(int(round(K * (patience or 1.0))), 1)
    carry, probs_at_sot, audio_features = _beam_prefill_jit(
        params, dims, mel, prompt, cfg, sample_len, prompt_len, beam_size,
        sot_index, compute_dtype, kv_quant=kv_quant, max_candidates=max_candidates,
    )
    n_chunks = (sample_len + chunk - 1) // chunk
    for c in range(n_chunks):
        steps = min(chunk, sample_len - c * chunk)
        carry = _beam_chunk_jit(
            params, dims, carry, jnp.int32(c * chunk), cfg, steps, B, K
        )
        beam_lp, fin_lp = np.asarray(carry[2]), np.asarray(carry[4])
        if (fin_lp.min(axis=1) >= beam_lp.max(axis=1)).all():
            break
    (cache, tokens, beam_lp, fin_tokens, fin_lp, _, _anc) = carry
    # any still-live beams count as candidates too (whisper finalizes by
    # appending eot to unfinished beams)
    live_tokens = tokens.reshape(B, K, sample_len)
    all_tokens = jnp.concatenate([fin_tokens, live_tokens], axis=1)  # (B, 2K, L)
    all_lp = jnp.concatenate([fin_lp, beam_lp], axis=1)  # (B, 2K)
    return all_tokens, all_lp, probs_at_sot, audio_features


# ---------------------------------------------------------------------------
# multi-chip batched inference: SPMD decode over a device mesh
# ---------------------------------------------------------------------------

_INFER_MESH = None
_INFER_MESH_AUTO_TRIED = False
_SHARDED_DECODE_CACHE: dict = {}


def set_infer_mesh(mesh) -> None:
    """Register (or clear, with None) the mesh batched decoding shards over.

    SURVEY §5 long-context story — batched multi-window decoding ACROSS
    chips: with a mesh registered, ``decode`` runs the entire decode program
    (audio encode + prompt prefill + sampling loop) inside ``shard_map``,
    window batch sharded over every mesh axis, params replicated. Decoding is
    embarrassingly batch-parallel (reference evidence that eval decodes
    batches across devices: scripts/eval/eval.py:1845-1847), so each chip
    runs the normal single-chip kernel stack on its local windows with zero
    collectives on the hot path; the sampling loop's early exit moves
    on-device (``lax.while_loop`` over chunk scans, exiting per chip) so the
    mesh path has NO host round-trips at all — the single-chip path pays one
    per chunk.
    """
    global _INFER_MESH
    _INFER_MESH = mesh
    _SHARDED_DECODE_CACHE.clear()


def _usable_infer_mesh(batch: int):
    """The registered (or auto-created) mesh if it can shard ``batch``."""
    global _INFER_MESH, _INFER_MESH_AUTO_TRIED
    mesh = _INFER_MESH
    if mesh is None and not _INFER_MESH_AUTO_TRIED:
        # OLMOASR_INFER_MESH=auto (default): on a multi-chip TPU host, shard
        # batched decode over all local devices without any caller opt-in —
        # transcribe_many, the eval harness, and serve.py all inherit it.
        _INFER_MESH_AUTO_TRIED = True
        if (
            os.environ.get("OLMOASR_INFER_MESH", "auto") == "auto"
            and jax.default_backend() == "tpu"
            and len(jax.devices()) > 1
        ):
            from olmoasr_tpu.parallel.mesh import make_mesh

            mesh = _INFER_MESH = make_mesh(len(jax.devices()), 1)
    if mesh is None:
        return None
    # stale-device guard (tests switch platforms; backend reinit)
    try:
        first = next(iter(mesh.devices.flat))
        live = set(jax.devices(first.platform))
    except (RuntimeError, StopIteration):
        live = set()
    if not set(mesh.devices.flat) <= live:
        return None
    if mesh.size <= 1 or batch % mesh.size != 0:
        return None
    return mesh


def _chunk_schedule(sample_len: int, chunk: int):
    """(chunk_len, n_chunks) with chunk_len * n_chunks == sample_len exactly
    (the on-device loop must not run steps past sample_len: they would keep
    accumulating sum_logprobs on unfinished rows)."""
    if chunk <= 0 or sample_len % chunk:
        return sample_len, 1
    return chunk, sample_len // chunk


def _sharded_greedy_fn(
    mesh, dims, cfg, sample_len, prompt_len, sot_index, compute_dtype,
    kv_quant, greedy_only, chunk,
):
    key = (
        "greedy", mesh, dims, cfg, sample_len, prompt_len, sot_index,
        jnp.dtype(compute_dtype).name, kv_quant, greedy_only, chunk,
    )
    fn = _SHARDED_DECODE_CACHE.get(key)
    if fn is not None:
        return fn
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)
    sizes = [mesh.shape[a] for a in axes]
    bsp = P(axes)
    chunk_eff, n_chunks = _chunk_schedule(sample_len, chunk)

    def body(params, mel, prompt, rng, temperature):
        # decorrelate sampling across shards (greedy never consumes rng)
        idx = jnp.int32(0)
        for a, s in zip(axes, sizes):
            idx = idx * s + jax.lax.axis_index(a)
        rng = jax.random.fold_in(rng, idx)
        carry, probs_at_sot, audio_features = _decode_prefill_jit(
            params, dims, mel, prompt, cfg, prompt_len, sample_len,
            sot_index, rng, compute_dtype, kv_quant,
        )

        def cond(s):
            c, ci = s
            return (ci < n_chunks) & ~jnp.all(c[2])

        def chunk_body(s):
            c, ci = s

            def step(cc, j):
                return _greedy_step(
                    cc, ci * chunk_eff + j, params, dims, cfg, temperature,
                    greedy_only,
                ), None

            c, _ = jax.lax.scan(step, c, jnp.arange(chunk_eff))
            return (c, ci + 1)

        carry, _ = jax.lax.while_loop(cond, chunk_body, (carry, jnp.int32(0)))
        _, tokens, _, sum_logprobs, _, _ = carry
        return tokens, sum_logprobs, probs_at_sot, audio_features

    fn = jax.jit(
        shard_map(
            body, mesh=mesh,
            in_specs=(P(), bsp, bsp, P(), P()),
            out_specs=(bsp, bsp, bsp, bsp),
            check_rep=False,
        )
    )
    _SHARDED_DECODE_CACHE[key] = fn
    return fn


def _sharded_beam_fn(
    mesh, dims, cfg, sample_len, prompt_len, beam_size, sot_index,
    compute_dtype, kv_quant, max_candidates, chunk,
):
    key = (
        "beam", mesh, dims, cfg, sample_len, prompt_len, beam_size, sot_index,
        jnp.dtype(compute_dtype).name, kv_quant, max_candidates, chunk,
    )
    fn = _SHARDED_DECODE_CACHE.get(key)
    if fn is not None:
        return fn
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)
    bsp = P(axes)
    chunk_eff, n_chunks = _chunk_schedule(sample_len, chunk)
    K = beam_size

    def body(params, mel, prompt):
        carry, probs_at_sot, audio_features = _beam_prefill_jit(
            params, dims, mel, prompt, cfg, sample_len, prompt_len, K,
            sot_index, compute_dtype, kv_quant=kv_quant,
            max_candidates=max_candidates,
        )
        B_local = mel.shape[0]

        def cond(s):
            c, ci = s
            done = jnp.all(c[4].min(axis=1) >= c[2].max(axis=1))
            return (ci < n_chunks) & ~done

        def chunk_body(s):
            c, ci = s

            def step(cc, j):
                return _beam_step(
                    cc, ci * chunk_eff + j, params, dims, cfg, B_local, K
                ), None

            c, _ = jax.lax.scan(step, c, jnp.arange(chunk_eff))
            return (c, ci + 1)

        carry, _ = jax.lax.while_loop(cond, chunk_body, (carry, jnp.int32(0)))
        (_, tokens, beam_lp, fin_tokens, fin_lp, _, _anc) = carry
        live_tokens = tokens.reshape(B_local, K, sample_len)
        all_tokens = jnp.concatenate([fin_tokens, live_tokens], axis=1)
        all_lp = jnp.concatenate([fin_lp, beam_lp], axis=1)
        return all_tokens, all_lp, probs_at_sot, audio_features

    fn = jax.jit(
        shard_map(
            body, mesh=mesh,
            in_specs=(P(), bsp, bsp),
            out_specs=(bsp, bsp, bsp, bsp),
            check_rep=False,
        )
    )
    _SHARDED_DECODE_CACHE[key] = fn
    return fn


# ---------------------------------------------------------------------------
# host orchestration: decode()
# ---------------------------------------------------------------------------


class MaximumLikelihoodRanker:
    """Pick the highest log-prob sequence, normalized by length or the Google
    NMT length penalty ([pip:whisper] decoding.MaximumLikelihoodRanker)."""

    def __init__(self, length_penalty: Optional[float]):
        self.length_penalty = length_penalty

    def rank(self, tokens: List[List[List[int]]], sum_logprobs: List[List[float]]):
        def scores(logprobs, lengths):
            result = []
            for logprob, length in zip(logprobs, lengths):
                if self.length_penalty is None:
                    penalty = length
                else:
                    penalty = ((5 + length) / 6) ** self.length_penalty
                result.append(logprob / penalty)
            return result

        lengths = [[len(t) for t in s] for s in tokens]
        return [
            int(np.argmax(scores(p, l))) for p, l in zip(sum_logprobs, lengths)
        ]


def _resolve_prompt(tokenizer: Tokenizer, options: DecodingOptions) -> List[int]:
    """Initial token sequence (DecodingTask._get_initial_tokens)."""
    tokens = list(tokenizer.sot_sequence)
    if options.without_timestamps:
        tokens = list(tokenizer.sot_sequence_including_notimestamps)
    if options.prefix is not None:
        prefix = options.prefix
        prefix_tokens = (
            tokenizer.encode(" " + prefix.strip()) if isinstance(prefix, str) else prefix
        )
        if options.sample_len is not None:
            max_prefix_len = 448 // 2 - options.sample_len
            prefix_tokens = prefix_tokens[-max_prefix_len:]
        tokens = tokens + list(prefix_tokens)
    if options.prompt is not None:
        prompt = options.prompt
        prompt_tokens = (
            tokenizer.encode(" " + prompt.strip()) if isinstance(prompt, str) else prompt
        )
        tokens = (
            [tokenizer.sot_prev] + list(prompt_tokens[-(448 // 2 - 1):]) + tokens
        )
    return tokens


def decode(
    params,
    dims: ModelDimensions,
    mel: Union[np.ndarray, jax.Array],
    options: DecodingOptions = DecodingOptions(),
    *,
    rng: Optional[jax.Array] = None,
    compute_dtype=None,
) -> Union[DecodingResult, List[DecodingResult]]:
    """Whisper-compatible ``decode``: batched 30s windows in, results out."""
    single = hasattr(mel, "ndim") and mel.ndim == 2
    mel = jnp.asarray(mel)
    if single:
        mel = mel[None]
    if mel.shape[-1] != audio_mod.N_FRAMES:
        mel = audio_mod.pad_or_trim(mel, audio_mod.N_FRAMES, axis=-1)

    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if options.fp16 else jnp.float32

    language = options.language or "en"
    # multilingual checkpoints have >= 51865 tokens (language + task specials);
    # derive from the vocab like [pip:whisper] ModelDimensions-based dispatch.
    multilingual = dims.n_vocab >= 51865
    # whisper's formula (model.py num_languages): n_vocab - 51765 - int(ml)
    num_languages = dims.n_vocab - 51765 - 1 if multilingual else 99
    tokenizer = get_tokenizer(
        multilingual=multilingual, num_languages=num_languages,
        language=language, task=options.task,
    )

    n_ctx = dims.n_text_ctx
    sample_len = options.sample_len or n_ctx // 2

    prompt = _resolve_prompt(tokenizer, options)
    # positional-embedding guard: the reference breaks its loop when
    # prompt+samples exceed n_ctx (whisper GreedyDecoder / inf_model n_ctx);
    # our dynamic_slice would silently clamp, so cap sample_len instead.
    sample_len = min(sample_len, n_ctx - len(prompt))
    if sample_len <= 0:
        raise ValueError(
            f"prompt length {len(prompt)} leaves no room to sample "
            f"(n_text_ctx={n_ctx})"
        )
    sot_index = prompt.index(tokenizer.sot)
    prompt_arr = jnp.asarray([prompt] * mel.shape[0], jnp.int32)

    cfg = build_filter_config(tokenizer, options, len(prompt), dims.n_vocab)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    if options.beam_size is not None and options.temperature == 0:
        return _decode_beam_host(
            params, dims, mel, prompt_arr, cfg, sample_len, options, tokenizer,
            sot_index, rng, compute_dtype, single,
        )

    n_groups = options.best_of if (options.best_of and options.temperature > 0) else 1
    B = mel.shape[0]
    # best_of groups ride extra TOKEN rows only: mel stays at B windows (one
    # encode, shared cross cache); prompt rows carry the group factor
    prompt_in = (
        jnp.repeat(prompt_arr, n_groups, axis=0) if n_groups > 1 else prompt_arr
    )

    mesh = _usable_infer_mesh(B)
    if mesh is not None:
        fn = _sharded_greedy_fn(
            mesh, dims, cfg, sample_len, len(prompt), sot_index,
            compute_dtype, options.kv_quant, options.temperature == 0,
            int(os.environ.get("OLMOASR_DECODE_CHUNK", "32")),
        )
        tokens, sum_logprobs, probs_at_sot, audio_features = fn(
            params, mel, prompt_in, rng, jnp.float32(options.temperature)
        )
    else:
        tokens, sum_logprobs, probs_at_sot, audio_features = _decode_greedy_jit(
            params, dims, mel, prompt_in, cfg, sample_len, len(prompt),
            sot_index, jnp.float32(options.temperature), rng, compute_dtype,
            options.kv_quant,
        )
    no_speech_probs = np.asarray(probs_at_sot[:, tokenizer.no_speech])
    tokens_np = np.asarray(tokens).reshape(B, n_groups, sample_len)
    lp_np = np.asarray(sum_logprobs).reshape(B, n_groups)
    no_speech_probs = no_speech_probs.reshape(B, n_groups)[:, 0]

    # trim at first eot; collect per group
    token_lists: List[List[List[int]]] = []
    lp_lists: List[List[float]] = []
    for b in range(B):
        group_tokens, group_lps = [], []
        for g in range(n_groups):
            seq = tokens_np[b, g].tolist()
            if tokenizer.eot in seq:
                seq = seq[: seq.index(tokenizer.eot)]
            group_tokens.append(seq)
            group_lps.append(float(lp_np[b, g]))
        token_lists.append(group_tokens)
        lp_lists.append(group_lps)

    return _finalize_results(
        token_lists, lp_lists, no_speech_probs, tokenizer, options,
        audio_features, language, single,
    )


def _decode_beam_host(
    params, dims, mel, prompt_arr, cfg, sample_len, options, tokenizer,
    sot_index, rng, compute_dtype, single,
):
    K = options.beam_size
    mesh = _usable_infer_mesh(mel.shape[0])
    if mesh is not None:
        max_candidates = max(int(round(K * (options.patience or 1.0))), 1)
        fn = _sharded_beam_fn(
            mesh, dims, cfg, sample_len, prompt_arr.shape[1], K, sot_index,
            compute_dtype, options.kv_quant, max_candidates,
            int(os.environ.get("OLMOASR_DECODE_CHUNK", "32")),
        )
        all_tokens, all_lp, probs_at_sot, audio_features = fn(
            params, mel, prompt_arr
        )
    else:
        all_tokens, all_lp, probs_at_sot, audio_features = _decode_beam_jit(
            params, dims, mel, prompt_arr, cfg, sample_len,
            prompt_arr.shape[1], K, sot_index, rng, compute_dtype,
            patience=options.patience, kv_quant=options.kv_quant,
        )
    B = mel.shape[0]
    no_speech_probs = np.asarray(probs_at_sot[:, tokenizer.no_speech])
    tokens_np = np.asarray(all_tokens)  # (B, 2K, L)
    lp_np = np.asarray(all_lp)  # (B, 2K)

    token_lists, lp_lists = [], []
    for b in range(B):
        group_tokens, group_lps = [], []
        for g in range(tokens_np.shape[1]):
            if lp_np[b, g] <= -1e29:
                continue
            seq = tokens_np[b, g].tolist()
            if tokenizer.eot in seq:
                seq = seq[: seq.index(tokenizer.eot)]
            group_tokens.append(seq)
            group_lps.append(float(lp_np[b, g]))
        if not group_tokens:
            group_tokens, group_lps = [[]], [float(lp_np[b, 0])]
        token_lists.append(group_tokens)
        lp_lists.append(group_lps)

    return _finalize_results(
        token_lists, lp_lists, no_speech_probs, tokenizer, options,
        audio_features, options.language or "en", single,
    )


def _finalize_results(
    token_lists, lp_lists, no_speech_probs, tokenizer, options,
    audio_features, language, single,
) -> Union[DecodingResult, List[DecodingResult]]:
    ranker = MaximumLikelihoodRanker(options.length_penalty)
    selected = ranker.rank(token_lists, lp_lists)
    results = []
    for b, idx in enumerate(selected):
        toks = token_lists[b][idx]
        text = tokenizer.decode(toks).strip()
        n = len(toks)
        avg_logprob = lp_lists[b][idx] / (n + 1) if n >= 0 else np.nan
        results.append(
            DecodingResult(
                audio_features=audio_features[b] if audio_features is not None else None,
                language=language,
                tokens=toks,
                text=text,
                avg_logprob=avg_logprob,
                no_speech_prob=float(no_speech_probs[b]),
                temperature=options.temperature,
                compression_ratio=compression_ratio(text),
            )
        )
    return results[0] if single else results


# ---------------------------------------------------------------------------
# language detection
# ---------------------------------------------------------------------------


def detect_language(
    params,
    dims: ModelDimensions,
    mel: Union[np.ndarray, jax.Array],
    tokenizer: Optional[Tokenizer] = None,
) -> Tuple[np.ndarray, Union[Dict[str, float], List[Dict[str, float]]]]:
    """Single-forward language id ([pip:whisper] decoding.detect_language).

    OLMoASR models are English-only; this exists for API parity and returns a
    distribution over the 99 language tokens.
    """
    if tokenizer is None:
        tokenizer = get_tokenizer(multilingual=False)
    single = mel.ndim == 2
    mel = jnp.asarray(mel)
    if single:
        mel = mel[None]
    if mel.shape[-1] != audio_mod.N_FRAMES:
        mel = audio_mod.pad_or_trim(mel, audio_mod.N_FRAMES, axis=-1)

    audio_features = model_mod.encode_audio(params, dims, mel)
    B = mel.shape[0]
    sot = jnp.full((B, 1), tokenizer.sot, jnp.int32)
    cache = model_mod.init_cache(params, dims, audio_features, max_len=4)
    logits, _ = model_mod.decode_step(params, dims, sot, cache)
    logits = logits[:, 0].astype(jnp.float32)  # (B, V)

    mask = np.full((logits.shape[-1],), -np.inf, np.float32)
    mask[list(tokenizer.all_language_tokens)] = 0.0
    logits = logits + jnp.asarray(mask)
    language_tokens = jnp.argmax(logits, axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    probs_np = np.asarray(probs)
    language_probs = [
        {
            c: float(probs_np[i, t])
            for c, t in zip(tokenizer.all_language_codes, tokenizer.all_language_tokens)
        }
        for i in range(B)
    ]
    if single:
        return np.asarray(language_tokens)[0], language_probs[0]
    return np.asarray(language_tokens), language_probs
