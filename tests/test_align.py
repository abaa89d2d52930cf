"""Machine-transcript alignment + man/mach merge tests."""

from olmoasr_tpu.data.align import align_machine_transcript, merge_man_mach_segs
from olmoasr_tpu.utils import convert_to_timestamp as ts


def man_t(cues):
    return {(ts(s), ts(e)): txt for s, e, txt in cues}


def test_align_simple():
    mach = man_t([(100, 5000, "machine hello world"), (5100, 9000, "more words")])
    segs, counter = align_machine_transcript(mach, [(0, 5000)], video_id="v")
    assert len(segs) == 1
    assert segs[0] is not None
    assert "machine hello world" in segs[0].seg_content
    assert "more words" not in segs[0].seg_content


def test_align_two_boundaries():
    mach = man_t([(0, 4000, "a"), (4000, 8000, "b"), (8000, 12000, "c")])
    segs, _ = align_machine_transcript(mach, [(0, 8000), (8000, 12000)], "v")
    assert segs[0].text == "a b"
    assert segs[1].text == "c"


def test_merge_attaches_edit_dist():
    man = man_t([(0, 4000, "hello world"), (4000, 8000, "good day")])
    mach = man_t([(50, 3900, "hello world"), (4100, 7900, "good night")])
    merged, man_counter, mach_counter = merge_man_mach_segs(man, mach, video_id="v")
    assert len(merged) == 1  # both cues fit one 30s manual segment
    row = merged[0].merged
    assert row["seg_edit_dist"] > 0  # 'night' vs 'day'
    assert "mach_seg_content" in row and "hello world" in row["mach_seg_content"]


def test_merge_without_machine():
    man = man_t([(0, 4000, "hello world")])
    merged, _, mach_counter = merge_man_mach_segs(man, None, video_id="v")
    assert merged[0].merged["seg_edit_dist"] == 0.0
    assert merged[0].merged["mach_text"] == ""
    assert mach_counter is None
