"""Watermarked windowed host-rate stream: finalization + late-data drop.

Two availableNow passes over a file source with a shared checkpoint: pass
1 establishes the watermark; pass 2 advances it past the first windows
(finalizing them, append emits exactly once) while a too-late straggler
in the same batch is dropped.
"""

import json
import os

from goscrape_spark.streaming.metrics import host_rate_stream

BASE = 1_700_000_000  # any fixed epoch second


def _write(dirpath, name, rows):
    tmp = os.path.join(dirpath, name + ".tmp")
    with open(tmp, "w") as f:
        for host, off in rows:
            f.write(json.dumps({"host": host, "ts": BASE + off}) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def _run_pass(spark, src, ckpt, out):
    """One availableNow pass to a FILE sink (memory sink cannot recover
    from a checkpoint); returns ALL rows emitted so far."""
    events = (spark.readStream.schema("host string, ts long").json(src)
              .selectExpr("host", "cast(ts as timestamp) as ts"))
    q = (host_rate_stream(events, window_s=10, watermark_s=30)
         .writeStream.format("json").option("path", out)
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    emitted = (spark.read.schema(
        "window_start timestamp, window_end timestamp, host string, "
        "fetches long, rate_per_sec double").json(out))
    return {(r.host, int(r.window_start.timestamp()) - BASE,
             r.fetches, r.rate_per_sec)
            for r in emitted.collect() if r.host is not None}


def test_host_rate_windows_finalize_and_drop_late(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    # pass 1: two hosts, events inside [BASE, BASE+10) and [BASE+10, +20)
    _write(src, "b1.json",
           [("a", 1), ("a", 3), ("a", 5), ("b", 2),
            ("a", 12), ("b", 15)])
    out1 = _run_pass(spark, src, ckpt, out)
    # watermark was 0 during the batch -> nothing finalized yet
    assert out1 == set()

    # pass 2: an event far ahead advances the watermark past the first
    # windows; a straggler 100s old is LATE (beyond the 30s tolerance)
    _write(src, "b2.json", [("a", 120), ("a", -100)])
    out2 = _run_pass(spark, src, ckpt, out)
    got = {(h, w, n) for h, w, n, _ in out2}
    # the first two decades finalized exactly once each; the 100s-old
    # straggler was dropped (its window is already closed — had it been
    # admitted, a ("a", -100//10*10, ...) row would appear)
    assert got == {("a", 0, 3), ("b", 0, 1), ("a", 10, 1), ("b", 10, 1)}
    # rates are fetches / window seconds
    assert all(abs(r - n / 10.0) < 1e-9 for _, _, n, r in out2)
