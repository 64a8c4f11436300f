"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Timing forces full materialization through the noop sink (no disk write,
no driver collect).  Synthetic-fixture generation is excluded from timings
(it is input preparation, done once and cached).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from usc_ds_relationextraction_spark.session import get_spark  # noqa: E402
from usc_ds_relationextraction_spark.sources import synthetic as syn  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# min-of-N protocol: this host carries ambient co-tenant load that swings
# single-shot totals ±15% (round-2 lesson: BENCH_r02's 44.6s "regression"
# was a loaded run; idle rerun measured 30.7s).  The MIN over repeats is
# the least-contended estimate; each repeat rebuilds the DataFrame so no
# stage results are reused.
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

# headline set: the end-to-end KG extraction plus the hottest operator
# families (scan+tokenize, shuffle agg, window sweep, dedup, similarity)
HEADLINE = [
    "triples_ds",
    "p1_tokenize",
    "np_chunk_mentions",
    "p4_pair_generation",
    "em_feature_strings",   # Arrow-UDF feature library (the Python stage)
    "a3_cooccur_real",      # feature-type co-occurrence (the hot shuffle)
    "a3_cooccur_counts",
    "w4_threshold_sweep",
    "m11_threshold_tune",   # full normalize+sweep+P/R/F1 protocol
    "dedup_exact",
    "sim_cosine_topk",
]


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _loadavg() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def _cpu_canary() -> tuple[float, float]:
    """Host-speed canary: wall seconds for a fixed single-thread workload
    (2M chained md5 digests), plus the kernel-reported core MHz.

    The loadavg detector proves nothing ELSE ran in the guest; it cannot
    prove how fast the guest actually WAS.  Round 5 hit exactly that
    gap: the same code and data read 32.68s during a half-speed host
    phase (hypervisor CPU steal — this canary read 1.50s) and 17.18s two
    hours later on the SAME boot (canary 1.05s), detector green both
    times; the 13.44s record's full-speed boot is inferred ≈0.75s.
    /proc/cpuinfo reports a static nominal MHz throughout, so the
    kernel-visible frequency cannot substitute.  Stamping a
    deterministic CPU-bound canary into every bench JSON makes readings
    self-normalizing: compare absolute totals only between runs with
    similar canary times; ratios (per-query shape, scaling efficiency)
    carry regardless."""
    import hashlib
    x = b"\x00" * 16
    t0 = time.time()
    for _ in range(2_000_000):
        x = hashlib.md5(x).digest()
    sec = time.time() - t0
    mhz = 0.0
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("cpu MHz"):
                    mhz = float(line.split(":")[1])
                    break
    except OSError:
        pass
    return round(sec, 3), mhz


class LoadSampler:
    """Samples 1-min loadavg every 5s (first sample immediate) for the
    contention stamp — same mechanical signal scaling_bench.py uses.
    Ambient co-tenant load on this host swings totals ±15-35% (round-4's
    21.76s-vs-16.29s ambiguity); a loadavg trace above the bench's own
    core budget marks the run as contended, not authoritative."""

    def __init__(self) -> None:
        self.samples: list[float] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while True:
            self.samples.append(_loadavg())
            if self._stop.wait(5.0):
                return

    def __enter__(self) -> "LoadSampler":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join(timeout=6.0)

    @property
    def peak(self) -> float:
        return max(self.samples) if self.samples else 0.0


def main() -> None:
    tag = os.path.basename(os.path.normpath(SF_DIR))
    sf = float(tag.replace("sf", "")) if tag.startswith("sf") else 0.1
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    # prepare fixtures outside the timers, warm the JVM once
    syn.ensure_fixtures(spark, SF_DIR)
    qs = entrymod.queries()
    force(qs["a4_weighted_degree"](spark, SF_DIR))  # warm-up

    canary_sec, cpu_mhz = _cpu_canary()  # before the timed suite
    load_before = _loadavg()
    times: dict[str, float] = {}
    with LoadSampler() as sampler:
        for name in HEADLINE:
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.time()
                force(qs[name](spark, SF_DIR))  # fresh plan per repeat
                best = min(best, time.time() - t0)
            times[name] = round(best, 3)
    # the suite's own budget is one local[CPUS] JVM (+25% slack for
    # service threads); loadavg past that, or a pre-existing load above
    # half the core count, means something external shared the cores.
    load_budget = CPUS * 1.25
    contended = sampler.peak > load_budget or load_before > CPUS / 2

    # throughput extras: triples/sec and turns/sec through the full path
    n_triples = qs["triples_ds"](spark, SF_DIR).count()
    n_turns = syn.load_transcripts(spark, SF_DIR).count()
    total = round(sum(times.values()), 3)
    out = {
        "metric": "kg_construction_headline_suite",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": CPUS,
        "repeats": REPEATS,
        "n_turns": n_turns,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / max(times["triples_ds"], 1e-9), 1),
        "turns_per_sec": round(n_turns / max(times["triples_ds"], 1e-9), 1),
        "loadavg_before": load_before,
        "loadavg_peak_during": round(sampler.peak, 2),
        "loadavg_samples": len(sampler.samples),
        "loadavg_budget": load_budget,
        "contended": contended,
        "authoritative": not contended,
        "cpu_canary_md5_2m_sec": canary_sec,
        "cpu_mhz": cpu_mhz,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
