"""Extra benchmarks. ``bench.py`` is FROZEN for measurement (the driver
times rounds with its round-start copy), so everything exploratory lives
here:

  python bench_extra.py queries          noop-isolated per-query timings
                                         (guide §1.4) at SPARK_GRAFT_SF_DIR,
                                         warm + best-of-BENCH_XREPEATS
  python bench_extra.py verify_ablation  two-tier verify exchange ablation
                                         (cfg.verify_mh_band off vs on) at
                                         BENCH_N_FILES / SPARK_GRAFT_CPUS:
                                         runs both legs in subprocesses with
                                         event logs, reports the verify
                                         chain's shuffle-write bytes/time
                                         and wall, and proves the dup-pair
                                         outputs identical across legs

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_N_FILES as in bench.py;
DSS_ABLATION_BAND (default 0.35) the tier-1 band for the on-leg.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import uuid

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_FILES = int(os.environ.get("BENCH_N_FILES", "40000"))


def queries() -> None:
    """Per-query noop-sink timings: one warm pass, then best/median of
    BENCH_XREPEATS (default 3) — isolates the computation from the one-shot
    plan-compile cost bench.py's single-shot protocol includes."""
    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from datasketches_spark.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    reps = int(os.environ.get("BENCH_XREPEATS", "3"))
    out: dict = {}
    qs = entry_mod.queries()
    for name in bench_mod.HEADLINE:
        if name == "dedup_pipeline_e2e":
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = {"best": min(ts), "samples": ts}
    print(json.dumps({"mode": "queries", "sf_dir": SF_DIR, "cpus": CPUS,
                      "queries": out}))


def _verify_leg(band: float | None, evdir: str, ckpt: str) -> None:
    os.environ["SPARK_GRAFT_EVENTLOG"] = evdir
    import bench as bench_mod
    from datasketches_spark.config import DedupConfig
    from datasketches_spark.pipeline import run_dedup
    from datasketches_spark.session import get_spark

    spark = get_spark("verify_ablation", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    path = bench_mod.ensure_corpus(spark, N_FILES)
    docs = spark.read.parquet(path)
    cfg = DedupConfig(verify_mh_band=band)
    t0 = time.time()
    run_dedup(spark, docs, cfg, checkpoint_dir=ckpt,
              light_stages=os.environ.get("BENCH_LIGHT", "1") == "1")
    wall = time.time() - t0
    print(json.dumps({"leg": "on" if band is not None else "off",
                      "band": band, "wall_s": round(wall, 3)}))
    spark.stop()


def _verify_chain_shuffle(evdir: str) -> dict:
    """Sum shuffle-write bytes/time + wall over jobs labeled
    stage:verified_edges (tools/evlog.py's attribution, reduced)."""
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from evlog import load_events

    jobs, stage_job, agg = {}, {}, {"shw_mb": 0.0, "shw_s": 0.0, "wall_s": 0.0,
                                    "shr_mb": 0.0}
    for ev in load_events(evdir):
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get("spark.job.description", "")
            jobs[ev["Job ID"]] = {"desc": desc, "start": ev["Submission Time"]}
            for s in ev.get("Stage Infos", []):
                stage_job[s["Stage ID"]] = ev["Job ID"]
        elif e == "SparkListenerJobEnd":
            j = jobs.get(ev["Job ID"])
            if j and j["desc"].startswith("stage:verified_edges"):
                agg["wall_s"] += (ev["Completion Time"] - j["start"]) / 1e3
        elif e == "SparkListenerTaskEnd":
            jid = stage_job.get(ev["Stage ID"])
            if jid is None or not jobs[jid]["desc"].startswith("stage:verified_edges"):
                continue
            tm = ev.get("Task Metrics") or {}
            sw = tm.get("Shuffle Write Metrics") or {}
            agg["shw_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
            agg["shw_s"] += sw.get("Shuffle Write Time", 0) / 1e9
            sr = tm.get("Shuffle Read Metrics") or {}
            agg["shr_mb"] += (sr.get("Local Bytes Read", 0)
                              + sr.get("Remote Bytes Read", 0)) / 1e6
    return {k: round(v, 3) for k, v in agg.items()}


def _pair_set(ckpt: str) -> set:
    import glob

    import pyarrow.parquet as pq

    rows = set()
    for f in glob.glob(os.path.join(ckpt, "dup_pairs", "*.parquet")):
        t = pq.read_table(f, columns=["id_a", "id_b", "jaccard_kmv",
                                      "jaccard_minhash", "kind"])
        for a, b, jk, jm, kind in zip(*(t.column(c).to_pylist() for c in
                                        ["id_a", "id_b", "jaccard_kmv",
                                         "jaccard_minhash", "kind"])):
            rows.add((a, b, round(jk, 9), round(jm, 9), kind))
    return rows


def verify_ablation() -> None:
    base = os.path.join("/tmp", f"ablation_{uuid.uuid4().hex[:8]}")
    legs = {}
    for name, band in [("off", None), ("on", float(os.environ.get("DSS_ABLATION_BAND", "0.35")))]:
        evdir = os.path.join(base, f"ev_{name}")
        ckpt = os.path.join(base, f"ckpt_{name}")
        os.makedirs(evdir, exist_ok=True)
        env = dict(os.environ, BENCH_EXTRA_LEG=json.dumps(band),
                   BENCH_EXTRA_EV=evdir, BENCH_EXTRA_CKPT=ckpt)
        p = subprocess.run([sys.executable, __file__, "verify_leg"], env=env,
                           capture_output=True, text=True, timeout=5400)
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        if not line:
            sys.stderr.write(p.stderr[-4000:])
            raise SystemExit(f"leg {name} produced no output")
        legs[name] = json.loads(line[-1])
        legs[name]["verify_chain"] = _verify_chain_shuffle(evdir)
        legs[name]["_ckpt"] = ckpt
    same = _pair_set(legs["off"]["_ckpt"]) == _pair_set(legs["on"]["_ckpt"])
    for leg in legs.values():
        leg.pop("_ckpt")
    off, on = legs["off"]["verify_chain"], legs["on"]["verify_chain"]
    print(json.dumps({
        "mode": "verify_ablation", "n_files": N_FILES, "cpus": CPUS,
        "off": legs["off"], "on": legs["on"],
        "shuffle_write_mb_ratio": round(off["shw_mb"] / max(on["shw_mb"], 1e-9), 2),
        "pair_outputs_identical": same,
    }))
    shutil.rmtree(base, ignore_errors=True)


def scaling_paired() -> None:
    """PAIRED same-regime scaling readings (VERDICT r5 item 1 fallback
    protocol, promoted to a first-class campaign): N rounds, each running
    the local[BASE] and local[4*BASE] dedup legs BACK-TO-BACK via the
    frozen ``bench.py`` (BENCH_MODE=dedup_only subprocesses — the same
    legs the managed probe uses), so both legs of every ratio sample the
    SAME venue weather regime. Reports every pair and the median paired
    ratio. This is robust exactly where the best-of-leg statistic is not:
    on a host whose memory weather shifts between attempts, best-of mixes
    regimes across legs and the ratio measures the weather.

    Env: BENCH_PAIR_ROUNDS (default 3), BENCH_SCALE_BASE (default 2),
    BENCH_N_FILES / SPARK_GRAFT_* as bench.py."""
    rounds = int(os.environ.get("BENCH_PAIR_ROUNDS", "3"))
    base = int(os.environ.get("BENCH_SCALE_BASE", "2"))
    pair = (base, 4 * base)
    bench_py = os.path.join(_REPO, "bench.py")

    def leg(n: int) -> dict:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), BENCH_SCALING="0",
                   BENCH_MODE="dedup_only")
        p = subprocess.run([sys.executable, bench_py], env=env,
                           capture_output=True, text=True, timeout=5400)
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    pairs = []
    for i in range(rounds):
        lo = leg(pair[0])
        hi = leg(pair[1])
        ratio = hi["value"] / (4.0 * lo["value"])
        pairs.append({
            "round": i + 1,
            f"files_per_sec_{pair[0]}": lo["value"],
            f"files_per_sec_{pair[1]}": hi["value"],
            f"wall_{pair[0]}": lo["queries"]["dedup_pipeline_e2e"],
            f"wall_{pair[1]}": hi["queries"]["dedup_pipeline_e2e"],
            "mem_probe_lo": lo.get("mem_probe_mbps"),
            "mem_probe_hi": hi.get("mem_probe_mbps"),
            "paired_ratio": round(ratio, 3),
        })
        print(json.dumps(pairs[-1]), flush=True)
    ratios = sorted(p["paired_ratio"] for p in pairs)
    median = ratios[len(ratios) // 2] if len(ratios) % 2 else round(
        (ratios[len(ratios) // 2 - 1] + ratios[len(ratios) // 2]) / 2, 3)
    print(json.dumps({"mode": "scaling_paired", "n_files": N_FILES,
                      "pair": list(pair), "rounds": rounds,
                      "median_paired_ratio": median, "pairs": pairs}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        queries()
    elif mode == "verify_ablation":
        verify_ablation()
    elif mode == "verify_leg":
        _verify_leg(json.loads(os.environ["BENCH_EXTRA_LEG"]),
                    os.environ["BENCH_EXTRA_EV"],
                    os.environ["BENCH_EXTRA_CKPT"])
    elif mode == "scaling_paired":
        scaling_paired()
    else:
        raise SystemExit(f"unknown mode {mode}")
