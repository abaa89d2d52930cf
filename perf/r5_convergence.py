"""On-chip end-to-end convergence proof (r4 VERDICT next #5).

Trains a micro OLMoASR on 4 synthetic utterances ON THE REAL TPU through
the production entry (training.train_loop.main: sharded step, BatchLoader,
checkpointing), shows the loss collapsing toward zero (memorization),
reloads the checkpoint through the EVAL path (api.load_model on the
eval-format .npz) and greedy-decodes the training utterances back.

This is the full train -> checkpoint -> load -> decode loop on real
hardware — the reference validated its trainers "by monitoring model
behavior" (SURVEY §4); this is the falsifiable form of that.
Committed chip run: perf/r5_convergence.log.
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import olmoasr_tpu.cache_config  # noqa: F401

import numpy as np

WORK = "/tmp/r5_convergence"
STEPS = int(os.environ.get("CONV_STEPS", "400"))

TEXTS = [
    "alpha bravo charlie delta",
    "echo foxtrot golf hotel",
    "india juliet kilo lima",
    "mike november oscar papa",
]


def make_data():
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(f"{WORK}/audio", exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i, text in enumerate(TEXTS):
        # distinct deterministic waveform per utterance: tone stack + noise
        t = np.arange(16000 * 8) / 16000.0
        wav = sum(
            0.15 * np.sin(2 * np.pi * (220 + 97 * i + 53 * j) * t)
            for j in range(3)
        ) + 0.01 * rng.standard_normal(len(t))
        path = f"{WORK}/audio/utt{i}.npy"
        # int16 npy — the reference's segment-audio convention (utils.py
        # trim_audio writes s16le; the train loader divides npy by 32768,
        # dataset.py:211). A float32 npy here trains on audio scaled by
        # 1/32768, whose quiet mel bins clamp at the 1e-10 power floor —
        # a DIFFERENT mel than the transcribe path computes at decode time.
        np.save(path, (wav * 32768).clip(-32768, 32767).astype(np.int16))
        vtt = f"WEBVTT\n\n00:00.000 --> 00:07.500\n{text}\n"
        rows.append(
            {"audio_file": path, "transcript": vtt, "ext": "vtt",
             "norm_end": 8000}
        )
    with open(f"{WORK}/train.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def main():
    make_data()
    import jax

    if os.environ.get("CONV_CPU", "0") == "1":  # plumbing smoke only
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from olmoasr_tpu.models.dims import ModelDimensions
    from olmoasr_tpu.training import train_loop

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=128, n_audio_head=2,
        n_audio_layer=2, n_vocab=51864, n_text_ctx=448, n_text_state=128,
        n_text_head=2, n_text_layer=2,
    )
    metrics = train_loop.main(
        variant=dims,
        train_shards=f"{WORK}/train.jsonl",
        exp_name="conv_proof",
        train_steps=STEPS,
        eff_batch_size=4,
        micro_batch_size=4,
        peak_lr=3e-4,
        remat=False,
        ckpt_dir=f"{WORK}/ckpt",
        ckpt_every=STEPS,
        log_every=min(25, STEPS),  # final window must land on STEPS
        seed=0,
    )
    print("final train metrics:", metrics, flush=True)
    final_loss = float(metrics["train/loss"])

    # reload through the EVAL path: restore the saved orbax train state from
    # disk (NOT the in-memory one), convert with the production
    # save_eval_checkpoint (strips the padding row, gen_inf_ckpt semantics),
    # load via the user API, greedy-decode the training set
    from olmoasr_tpu.api import load_model
    from olmoasr_tpu.training import checkpoint as ckpt_mod
    from olmoasr_tpu.training import train as train_mod

    config = train_mod.TrainConfig(train_steps=STEPS, eff_batch_size=4,
                                   micro_batch_size=4, remat=False)
    optimizer = train_mod.make_optimizer(config)
    state, meta, mgr = ckpt_mod.resume_or_init(
        f"{WORK}/ckpt/conv_proof",
        lambda: train_mod.init_train_state(
            jax.random.PRNGKey(1), dims, config, optimizer
        ),
        dims,
    )
    print("restored checkpoint at step:", meta.get("global_step"), flush=True)
    assert int(meta.get("global_step", 0)) >= STEPS, "restore got init, not ckpt"
    ckpt_mod.save_eval_checkpoint(f"{WORK}/infer.npz", state, dims)
    mgr.close()
    model = load_model(f"{WORK}/infer.npz")

    n_hit = 0
    for i, text in enumerate(TEXTS):
        wav = np.load(f"{WORK}/audio/utt{i}.npy").astype(np.float32) / 32768.0
        # suppress_blank=False: the egress-blocked BPE ranks mean the
        # 256-byte fallback vocab is live, so the FIRST trained text token
        # is the literal " " byte (dataset.py encodes " "+text, whisper
        # convention) — exactly the token SuppressBlank forbids at sample
        # start. With real ranks " alpha" is one non-blank token and the
        # default filter config applies; the filter itself is pinned by
        # the logit-filter differential tests.
        out = model.transcribe(
            wav, temperature=0.0, without_timestamps=True,
            beam_size=None, best_of=None, suppress_blank=False,
            compression_ratio_threshold=None, logprob_threshold=None,
            no_speech_threshold=None,
        )
        got = out["text"].strip().lower()
        hit = got == text
        n_hit += hit
        print(f"utt{i}: want={text!r} got={got!r} {'OK' if hit else 'MISS'}",
              flush=True)

    print(f"\nRESULT: final_loss={final_loss:.4f} recovered={n_hit}/{len(TEXTS)}",
          flush=True)
    ok = final_loss < 0.15 and n_hit == len(TEXTS)
    print("CONVERGENCE PROOF:", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
