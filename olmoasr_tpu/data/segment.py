"""Segmentation engine: full videos -> ≤30s audio/transcript training segments.

Rebuild of ``/root/reference/olmoasr/preprocess.py`` (chunk_data, 30-1496;
shard driver 1499-1753). The reference implements this as a ~1200-line
two-pointer state machine; we reformulate it as an explicit walk over
alternating speech/gap intervals with the same behavioral contract:

  * speech segments: greedy — extend while (cue_end - segment_start) ≤ 30s;
    a segment starts at the previous segment's last cue end (inter-cue silence
    is included), or at the cue start after a no-speech restart;
  * token budget: a segment must fit the 448-token context; ts-mode count =
    2·cues + 1 + text + sot/eot, no-ts count = text + 3
    (olmoasr/utils.py:391-450). If ts-mode doesn't fit the segment still
    carries no-ts mode; if neither fits, trailing cues spill into the next
    segment;
  * single cues longer than 30s are skipped and counted
    (over_30_line_segment_count);
  * no-speech gaps: ≥30s gaps emit floor(gap/30s) empty 30s segments
    (norm_end=30000); a <30s gap whose following cue won't fit emits one
    empty partial segment (norm_end=gap);
  * at most SEGMENT_COUNT_THRESHOLD=120 segments per video
    (preprocess.py:27);
  * audio for every emitted segment is the fixed 30s window
    [segment_start, segment_start+30s) as int16 (olmoasr/utils.py:100-170).
"""

from __future__ import annotations

import dataclasses
import gzip
import json
import os
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

from olmoasr_tpu.tokenizer import Tokenizer, get_tokenizer
from olmoasr_tpu.utils import convert_to_milliseconds, convert_to_timestamp

SEGMENT_COUNT_THRESHOLD = 120
CTX_LIMIT = 448
WINDOW_MS = 30_000
MIN_DURATION_MS = 15  # too_short checks (olmoasr/utils.py:505-523)


@dataclass
class SegmentCounter:
    """Processing statistics (preprocess.py SegmentCounter / stats files)."""

    segment_count: int = 0
    empty_segment_count: int = 0
    over_30_line_segment_count: int = 0
    over_ctx_len_segment_count: int = 0
    faulty_audio_segment_count: int = 0
    too_short_segment_count: int = 0

    def to_dict(self) -> Dict[str, int]:
        return dataclasses.asdict(self)


@dataclass
class Segment:
    """One emitted segment; ``to_dict`` matches the reference JSONL row keys
    (olmoasr/utils.py:526-713 Segment.to_dict)."""

    subtitle_file: str
    seg_content: str
    text_timestamp: str
    audio_timestamp: str
    norm_end: int  # ms
    video_id: str
    seg_id: str
    audio_file: str
    ts_mode: bool
    no_ts_mode: bool
    only_no_ts_mode: bool
    num_tokens_no_ts_mode: int
    num_tokens_ts_mode: int
    # in-memory payloads (None when writing to disk)
    transcript: Optional[Dict[Tuple[str, str], str]] = None
    audio_arr: Optional[np.ndarray] = None

    def to_dict(self) -> Dict:
        return {
            "subtitle_file": self.subtitle_file,
            "seg_content": self.seg_content,
            "text_timestamp": self.text_timestamp,
            "audio_timestamp": self.audio_timestamp,
            "norm_end": self.norm_end,
            "id": self.video_id,
            "seg_id": self.seg_id,
            "audio_file": self.audio_file,
            "ts_mode": self.ts_mode,
            "no_ts_mode": self.no_ts_mode,
            "only_no_ts_mode": self.only_no_ts_mode,
            "num_tokens_no_ts_mode": self.num_tokens_no_ts_mode,
            "num_tokens_ts_mode": self.num_tokens_ts_mode,
        }


def token_budget(
    cues: Sequence[Tuple[int, int, str]],
    tokenizer: Tokenizer,
    last_seg: bool = False,
) -> Dict[str, Union[bool, int]]:
    """olmoasr/utils.py:391-450 ``over_ctx_len`` semantics."""
    n_text = sum(len(tokenizer.encode(" " + text.strip())) for _, _, text in cues)
    n_ts_tokens = len(cues) * 2 + (0 if last_seg else 1)
    num_ts_mode = n_ts_tokens + n_text + 2  # sot + eot
    num_no_ts_mode = n_text + 3  # sot + notimestamps + eot
    return {
        "ts_mode": num_ts_mode <= CTX_LIMIT,
        "no_ts_mode": num_no_ts_mode <= CTX_LIMIT,
        "num_tokens_ts_mode": num_ts_mode,
        "num_tokens_no_ts_mode": num_no_ts_mode,
    }


def _render_vtt(cues: Sequence[Tuple[int, int, str]], base_ms: int) -> str:
    """Rebased VTT content (olmoasr/utils.py:311-373 write_segment)."""
    lines = ["WEBVTT", ""]
    for s, e, text in cues:
        lines.append(
            f"{convert_to_timestamp(s - base_ms)} --> {convert_to_timestamp(e - base_ms)}"
        )
        lines.append(text)
        lines.append("")
    return "\n".join(lines)


def _fmt_audio_ts(start_ms: int) -> str:
    s = convert_to_timestamp(start_ms).replace(".", ",")
    e = convert_to_timestamp(start_ms + WINDOW_MS).replace(".", ",")
    return f"{s}_{e}"


def chunk_data(
    transcript: Dict[Tuple[str, str], str],
    *,
    transcript_ext: str = "vtt",
    audio: Optional[Union[str, np.ndarray]] = None,
    video_id: str = "",
    tokenizer: Optional[Tokenizer] = None,
    segment_output_dir: Optional[str] = None,
    in_memory: bool = True,
    transcript_only: bool = False,
    audio_only: bool = False,
    sample_rate: int = 16000,
) -> Tuple[List[Segment], SegmentCounter]:
    """Segment one video's transcript (+ audio) into ≤30s training segments."""
    tokenizer = tokenizer or get_tokenizer(False)
    counter = SegmentCounter()

    cues: List[Tuple[int, int, str]] = []
    for (s, e), text in transcript.items():
        s_ms = convert_to_milliseconds(s) if isinstance(s, str) else int(s)
        e_ms = convert_to_milliseconds(e) if isinstance(e, str) else int(e)
        cues.append((s_ms, e_ms, text))
    cues.sort(key=lambda c: (c[0], c[1]))

    waveform: Optional[np.ndarray] = None
    if audio is not None and not transcript_only:
        if isinstance(audio, np.ndarray):
            waveform = audio
        elif audio.endswith(".npy"):
            waveform = np.load(audio)
        else:
            from olmoasr_tpu.audio import load_audio

            waveform = (load_audio(audio) * 32768.0).astype(np.int16)
        if waveform.dtype != np.int16:
            waveform = (np.asarray(waveform, np.float32) * 32768.0).astype(np.int16)

    segments: List[Segment] = []

    def audio_window(start_ms: int) -> Optional[np.ndarray]:
        if waveform is None:
            return None
        a = int(start_ms * sample_rate / 1000)
        b = a + WINDOW_MS * sample_rate // 1000
        arr = waveform[a:b]
        return arr if len(arr) * 1000 >= MIN_DURATION_MS * sample_rate else None

    def emit(
        start_ms: int,
        seg_cues: List[Tuple[int, int, str]],
        norm_end: int,
        budget: Optional[Dict] = None,
        only_no_ts: bool = False,
    ):
        if counter.segment_count >= SEGMENT_COUNT_THRESHOLD:
            return False
        if norm_end < MIN_DURATION_MS:
            counter.too_short_segment_count += 1
            return True
        arr = audio_window(start_ms)
        if waveform is not None and arr is None:
            counter.faulty_audio_segment_count += 1
            return True
        budget = budget or token_budget(seg_cues, tokenizer)
        audio_ts = _fmt_audio_ts(start_ms)
        content = _render_vtt(seg_cues, start_ms)
        first = convert_to_timestamp(seg_cues[0][0] - start_ms) if seg_cues else convert_to_timestamp(0)
        last = (
            convert_to_timestamp(seg_cues[-1][1] - start_ms)
            if seg_cues
            else convert_to_timestamp(norm_end)
        )
        text_ts = f"{first.replace('.', ',')}_{last.replace('.', ',')}"
        seg_id = f"{video_id}_{counter.segment_count}"

        subtitle_file = f"{text_ts}.{transcript_ext}"
        audio_file = f"{audio_ts}.npy"
        if segment_output_dir and not in_memory:
            vdir = os.path.join(segment_output_dir, video_id)
            os.makedirs(vdir, exist_ok=True)
            subtitle_file = os.path.join(vdir, subtitle_file)
            audio_file = os.path.join(vdir, audio_file)
            if not audio_only:
                with open(subtitle_file, "w", encoding="utf-8") as f:
                    f.write(content)
            if arr is not None and not transcript_only:
                np.save(audio_file, arr)

        if not seg_cues:
            counter.empty_segment_count += 1
        segments.append(
            Segment(
                subtitle_file=subtitle_file,
                seg_content=content,
                text_timestamp=text_ts,
                audio_timestamp=audio_ts,
                norm_end=norm_end,
                video_id=video_id,
                seg_id=seg_id,
                audio_file=audio_file,
                ts_mode=bool(budget["ts_mode"]),
                no_ts_mode=bool(budget["no_ts_mode"]),
                only_no_ts_mode=only_no_ts or not budget["ts_mode"],
                num_tokens_no_ts_mode=int(budget["num_tokens_no_ts_mode"]),
                num_tokens_ts_mode=int(budget["num_tokens_ts_mode"]),
                transcript={
                    (convert_to_timestamp(s - start_ms), convert_to_timestamp(e - start_ms)): t
                    for s, e, t in seg_cues
                }
                if in_memory
                else None,
                audio_arr=arr if in_memory else None,
            )
        )
        counter.segment_count += 1
        return True

    i = 0
    n = len(cues)
    seg_start: Optional[int] = cues[0][0] if cues else None

    while i < n and counter.segment_count < SEGMENT_COUNT_THRESHOLD:
        assert seg_start is not None
        # --- gap handling: current position to the next cue -----------------
        gap = cues[i][0] - seg_start
        if gap >= WINDOW_MS:
            # emit full 30s empty segments over the gap
            n_full = gap // WINDOW_MS
            ok = True
            for k in range(n_full):
                ok = emit(seg_start + k * WINDOW_MS, [], WINDOW_MS)
                if not ok or counter.segment_count >= SEGMENT_COUNT_THRESHOLD:
                    break
            seg_start = seg_start + n_full * WINDOW_MS
            if seg_start == cues[i][0]:
                pass  # speech starts exactly at the window boundary
            continue

        # --- collect cues fitting in [seg_start, seg_start + 30s] -----------
        j = i
        while j < n and cues[j][1] - seg_start <= WINDOW_MS:
            j += 1

        if j == i:
            # nothing fits from seg_start
            if cues[i][1] - cues[i][0] > WINDOW_MS:
                # single over-30s cue: skip it (preprocess.py over_30 branch)
                counter.over_30_line_segment_count += 1
                i += 1
                seg_start = cues[i][0] if i < n else None
                continue
            if gap > 0:
                # small leading silence, but the cue still doesn't fit: emit
                # the silence as an empty partial segment, restart at the cue
                emit(seg_start, [], gap, only_no_ts=False)
                seg_start = cues[i][0]
                continue
            # cue fits within its own 30s window: restart exactly at its start
            seg_start = cues[i][0]
            if cues[i][1] - seg_start > WINDOW_MS:
                counter.over_30_line_segment_count += 1
                i += 1
                seg_start = cues[i][0] if i < n else None
            continue

        # --- token budget: shrink trailing cues until some mode fits --------
        seg_cues = [cues[k] for k in range(i, j)]
        budget = token_budget(seg_cues, tokenizer, last_seg=(j == n))
        while seg_cues and not (budget["ts_mode"] or budget["no_ts_mode"]):
            counter.over_ctx_len_segment_count += 1
            seg_cues = seg_cues[:-1]
            j -= 1
            if seg_cues:
                budget = token_budget(seg_cues, tokenizer, last_seg=(j == n))
        if not seg_cues:
            # a single cue alone exceeds the context: skip it
            i += 1
            seg_start = cues[i][0] if i < n else None
            continue

        norm_end = seg_cues[-1][1] - seg_start
        if not emit(seg_start, seg_cues, norm_end, budget):
            break
        seg_start = seg_cues[-1][1]
        i = j

    return segments, counter


# ---------------------------------------------------------------------------
# shard driver (preprocess.py:1499-1753 preprocess_jsonl(s))
# ---------------------------------------------------------------------------


def preprocess_jsonl(
    jsonl_path: str,
    output_dir: str,
    *,
    audio_root: Optional[str] = None,
    transcript_only: bool = True,
    subsample: Optional[float] = None,
    seed: int = 42,
) -> Dict[str, int]:
    """Segment every video row of one JSONL(.gz) shard; writes a
    ``<shard>_segments.jsonl.gz`` plus a stats json."""
    from olmoasr_tpu.data.transcripts import TranscriptReader

    opener = gzip.open if jsonl_path.endswith(".gz") else open
    rows = []
    with opener(jsonl_path, "rt", encoding="utf-8") as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))

    if subsample:
        rng = np.random.default_rng(seed)
        keep = rng.random(len(rows)) < subsample
        rows = [r for r, k in zip(rows, keep) if k]

    os.makedirs(output_dir, exist_ok=True)
    base = os.path.basename(jsonl_path).split(".")[0]
    out_path = os.path.join(output_dir, f"{base}_segments.jsonl.gz")
    totals = SegmentCounter()

    with gzip.open(out_path, "wt", encoding="utf-8") as out:
        for row in rows:
            video_id = row.get("id") or row.get("video_id") or ""
            content = row.get("content") or row.get("transcript") or ""
            ext = row.get("ext", "vtt")
            transcript, _, _ = TranscriptReader(
                transcript_string=content, ext=ext
            ).read()
            audio = row.get("audio_file")
            if audio and audio_root:
                audio = os.path.join(audio_root, audio)
            segments, counter = chunk_data(
                transcript,
                transcript_ext=ext,
                audio=audio if not transcript_only else None,
                video_id=video_id,
                transcript_only=transcript_only,
                segment_output_dir=output_dir,
                in_memory=False,
            )
            for seg in segments:
                out.write(json.dumps(seg.to_dict()) + "\n")
            for f_ in dataclasses.fields(SegmentCounter):
                setattr(
                    totals, f_.name,
                    getattr(totals, f_.name) + getattr(counter, f_.name),
                )

    stats = totals.to_dict()
    with open(os.path.join(output_dir, f"{base}_stats.json"), "w") as f:
        json.dump(stats, f)
    return stats


def preprocess_jsonls(
    jsonl_paths: Sequence[str],
    output_dir: str,
    *,
    num_workers: int = 0,
    **kwargs,
) -> Dict[str, int]:
    """Multi-shard driver with optional process pool (preprocess.py:1669-1753)."""
    if num_workers > 0:
        import multiprocessing as mp
        from functools import partial

        with mp.Pool(num_workers) as pool:
            all_stats = pool.map(
                partial(preprocess_jsonl, output_dir=output_dir, **kwargs),
                jsonl_paths,
            )
    else:
        all_stats = [preprocess_jsonl(p, output_dir, **kwargs) for p in jsonl_paths]

    total: Dict[str, int] = {}
    for s in all_stats:
        for k, v in s.items():
            total[k] = total.get(k, 0) + v
    return total


if __name__ == "__main__":
    import argparse
    import glob as _glob
    import json as _json

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--shards", required=True, help="glob of raw JSONL shards")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--mode", default="transcript_only",
                   choices=["transcript_only", "audio_only"])
    p.add_argument("--num_workers", type=int, default=0)
    a = p.parse_args()
    stats = preprocess_jsonls(
        sorted(_glob.glob(a.shards)), a.out_dir,
        transcript_only=(a.mode == "transcript_only"),
        num_workers=a.num_workers,
    )
    print(_json.dumps(stats))
