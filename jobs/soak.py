#!/usr/bin/env python
"""Scale soak (round-3): one multi-million-doc build+query run with
per-stage walls, skew counters, and WAND block-prune ratios at realistic
vocabulary — evidence that no build stage goes superlinear between two
corpus sizes an order of magnitude apart.

Protocol
--------
* corpus: ``corpus.pages_df`` (deterministic Common-Crawl-style pages,
  BASELINE.json input_hint shape) at ``--docs`` (default 5M) and a
  ``--baseline-docs`` reference size (default 1M), ``vocab_mult=50``
  (~100k distinct terms — realistic web-ish vocabulary, Zipf tail).
* build: the real persisted build (``store.write_index``) on
  ``local[$SPARK_GRAFT_CPUS]``; stage walls parsed from the build's own
  ``_build_log.jsonl`` lineage (analyze batches + merge phase).
* queries: warmed medians over hot/rare/and/or/dismax/phrase/wildcard,
  plus WAND prune ratios (survivor blocks / total blocks at the exact
  final θ) for a hot and a mid-frequency term.
* output: ``SOAK.json`` at the repo root (picked up by bench.py into
  BENCH_r{N}.json) + a human log on stderr.

Run detached — this takes ~15-30 min:
    nohup python jobs/soak.py > /tmp/soak.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
VOCAB_MULT = int(os.environ.get("SOAK_VOCAB_MULT", "50"))


def log(msg: str) -> None:
    print(f"[soak +{time.perf_counter() - T0:8.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("whoosh-spark-soak")
        .config("spark.sql.shuffle.partitions", str(2 * CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        # 48g, not bigger: the JVM heap shares the box with ~CPUS Python
        # workers whose Arrow batches grow with corpus length — an 80g heap
        # OOM-killed the 5M leg (JVM 72G RSS + 32 workers ≈ >125G)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # worker peak RSS scales with batch size × doc length × cores; at
        # 10M docs the 32-core/32k-batch default global-OOMs a 125G box —
        # run bigger-than-5M legs at fewer cores and a smaller batch
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SOAK_ARROW_BATCH", "32768"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # UI on: the REST status API is how the soak attributes merge cost
        # (shuffle bytes + external-sort SPILL per stage, _exec_metrics)
        .config("spark.ui.enabled", os.environ.get("SOAK_UI", "true"))
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )


def _exec_metrics(spark, since_stage: int) -> dict:
    """Aggregate stage metrics (Spark REST status API) for stages submitted
    after ``since_stage`` — spill is the smoking gun for a superlinear
    merge: nonzero diskBytesSpilled means per-partition sort working sets
    outgrew execution memory and the fix is more (data-sized) partitions,
    not more cores."""
    import urllib.request

    url = getattr(spark.sparkContext, "uiWebUrl", None)
    if not url:
        return {}
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=30,
        ) as resp:
            stages = json.load(resp)
    except Exception as exc:  # UI disabled / port hidden — metrics optional
        log(f"exec metrics unavailable: {exc}")
        return {}
    keys = ("memoryBytesSpilled", "diskBytesSpilled",
            "shuffleReadBytes", "shuffleWriteBytes",
            "inputBytes", "outputBytes", "executorRunTime")
    tot = {k: 0 for k in keys}
    worst = []
    for st in stages:
        if st.get("stageId", -1) <= since_stage:
            continue
        for k in keys:
            tot[k] += int(st.get(k, 0) or 0)
        worst.append((int(st.get("executorRunTime", 0) or 0),
                      int(st.get("stageId", -1)),
                      int(st.get("diskBytesSpilled", 0) or 0),
                      int(st.get("shuffleWriteBytes", 0) or 0),
                      (st.get("name") or "").split("\n")[0][:80]))
    worst.sort(reverse=True)
    gb = 1024 ** 3
    return {
        "spill_mem_gb": round(tot["memoryBytesSpilled"] / gb, 2),
        "spill_disk_gb": round(tot["diskBytesSpilled"] / gb, 2),
        "shuffle_read_gb": round(tot["shuffleReadBytes"] / gb, 2),
        "shuffle_write_gb": round(tot["shuffleWriteBytes"] / gb, 2),
        "input_gb": round(tot["inputBytes"] / gb, 2),
        "executor_time_s": round(tot["executorRunTime"] / 1000, 1),
        "top_stages": [
            {"stage": sid, "run_s": round(ms / 1000, 1),
             "spill_disk_gb": round(sp / gb, 2),
             "shuffle_write_gb": round(sw / gb, 2), "name": name}
            for ms, sid, sp, sw, name in worst[:5]
        ],
    }


def _max_stage(spark) -> int:
    try:
        jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        mx = -1
        for j in jobs:
            info = spark.sparkContext.statusTracker().getJobInfo(j)
            if info:
                mx = max([mx, *info.stageIds])
        return mx
    except Exception:
        return -1


def _ensure_corpus(spark, n_docs: int) -> str:
    from whoosh_spark.corpus import pages_df

    path = os.path.join(REPO, ".benchdata",
                        f"soak_pages{n_docs}_v{VOCAB_MULT}.parquet")
    if not os.path.exists(path):
        log(f"generating {n_docs} pages (vocab_mult={VOCAB_MULT}) -> {path}")
        pages = pages_df(spark, n_docs, partitions=4 * CPUS,
                         vocab_mult=VOCAB_MULT)
        pages.write.mode("overwrite").parquet(path)
    return path


def _stage_walls(ix_dir: str) -> dict:
    """Per-stage walls + skew counters from the build's own lineage log."""
    import math

    recs = []
    with open(os.path.join(ix_dir, "_build_log.jsonl")) as fh:
        for line in fh:
            recs.append(json.loads(line))
    an = [r for r in recs if r.get("phase") == "analyze"]
    mg = [r for r in recs if r.get("phase") == "merge"]
    walls = [r["wall_ms"] / 1000 for r in an]
    docs = [r.get("n_docs", 0) for r in an]
    out = {
        "analyze_batches": len(an),
        "analyze_wall_s": round(sum(walls), 1),
        "analyze_batch_skew": round(max(walls) / (sum(walls) / len(walls)), 2)
        if walls else None,
        "analyze_docs_per_batch_cv": round(
            statistics.pstdev(docs) / statistics.mean(docs), 3)
        if docs and statistics.mean(docs) else None,
        "merge_wall_s": round(sum(r["wall_ms"] for r in mg) / 1000, 1),
    }
    if mg:
        last = mg[-1]
        if last.get("steps_ms"):
            out["merge_steps_s"] = {k: round(v / 1000, 1)
                                    for k, v in last["steps_ms"].items()}
        for k in ("merge_partitions", "analyzed_bytes"):
            if k in last:
                out[k] = last[k]
    counters = mg[-1].get("counters", {}) if mg else {}
    if counters:
        out["merge_counters"] = counters
    assert all(not math.isnan(w) for w in walls)
    return out


def _build(spark, corpus_path: str, n_docs: int) -> dict:
    from whoosh_spark import store

    ix_dir = os.path.join(REPO, ".benchdata", f"soak_ix_{n_docs}")
    shutil.rmtree(ix_dir, ignore_errors=True)
    docs = spark.read.parquet(corpus_path)
    log(f"building {n_docs}-doc index -> {ix_dir}")
    stage0 = _max_stage(spark)
    t0 = time.perf_counter()
    store.write_index(docs, ix_dir)
    wall = time.perf_counter() - t0
    res = {
        "n_docs": n_docs,
        # legs merged into SOAK.json across invocations can differ in
        # cores/batch config — stamp each run so per-doc comparisons are
        # read against the config they actually ran under
        "cores": CPUS,
        "arrow_batch": int(os.environ.get("SOAK_ARROW_BATCH", "32768")),
        "build_wall_s": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "stages": _stage_walls(ix_dir),
        "exec": _exec_metrics(spark, stage0),
        "ix_dir": ix_dir,
    }
    log(f"build done: {res['build_wall_s']}s ({res['docs_per_sec']} docs/s)")
    return res


def _queries(spark, ix_dir: str, reps: int = 3) -> dict:
    from whoosh_spark import store
    from whoosh_spark.query import ast as Q
    from whoosh_spark.search import Searcher

    ix = store.load_index(spark, ix_dir)
    s = Searcher(ix)
    cases = {
        "term_hot": Q.Term("data"),
        "term_mid": Q.Term("toward"),
        "term_rare": Q.Term("xr000123") if VOCAB_MULT > 1 else Q.Term("rare0123"),
        "and_hot_hot": Q.And([Q.Term("data"), Q.Term("query")]),
        "or_hot_rare": Q.Or([Q.Term("data"), Q.Term("crawl")]),
        "dismax": Q.DisMax([Q.Term("data"), Q.Term("crawl")], tiebreak=0.5),
        "phrase_2": Q.Phrase(["web", "index"]),
        # 3 hot constituents: the worst positional shape (rare-slot gate
        # can't fire, 3 full position streams decode) — the baseline the
        # chained pair-candidate gate is measured against
        "phrase_3": Q.Phrase(["web", "index", "data"]),
        "wildcard": Q.Wildcard("quer*"),
    }
    out = {}
    pooled = []
    for name, q in cases.items():
        s.search(q, limit=10).collect()  # warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            s.search(q, limit=10).collect()
            times.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(times), 3)
        pooled.extend(times)
        log(f"query {name}: {out[name]}s")
    ps = sorted(pooled)
    k = 0.95 * (len(ps) - 1)
    f = int(k)
    out["query_p95"] = round(
        ps[f] + (ps[min(f + 1, len(ps) - 1)] - ps[f]) * (k - f), 3)
    out["wand_prune"] = _wand_prune(ix, s, ["data", "toward", "about"])
    # optional adjacent-pair accelerator leg: attach the nextword segment
    # to the already-built index, then time the SAME hot-hot phrase through
    # the pair plan (positional timing is phrase_2 above)
    if os.environ.get("SOAK_PAIRS", "0") == "1":
        t0 = time.perf_counter()
        # hot-only pairs: constituents must clear PAIR_MIN_DF.  Default is
        # a FRACTION of the corpus (2% of docs) so the indexed head stays
        # scale-stable; values >= 1 are absolute dfs.  Round 5: the pair
        # stream DERIVES from the index's persisted analyzed/ segment —
        # no docs argument, no raw-text re-analysis
        min_df = float(os.environ.get("SOAK_PAIR_MIN_DF", "0.02"))
        store.build_pair_segment(spark, ix_dir, pair_min_df=min_df)
        out["pair_build_wall_s"] = round(time.perf_counter() - t0, 1)
        out["pair_min_df"] = min_df
        ixp = store.load_index(spark, ix_dir)
        sp = Searcher(ixp)
        cases = [("phrase_2_pair", Q.Phrase(["web", "index"])),
                 ("phrase_2_pair_freq",
                  Q.Phrase(["web", "index"], scoring="freq")),
                 # the ADVERSARIAL k-word shape (all three constituents
                 # and both pairs near-corpus-wide): the round-5 payoff
                 # gate must DECLINE here, so this leg should track the
                 # positional phrase_3 above — never a net loss
                 ("phrase_3_pair",
                  Q.Phrase(["web", "index", "data"])),
                 # the SELECTIVE k-word shape (rarest pair ~3% of docs):
                 # the gate's intended use case — positional baseline
                 # first, then the gated plan
                 ("phrase_3_sel_pos",
                  Q.Phrase(["spark", "crawl", "data"])),
                 ("phrase_3_sel_gated",
                  Q.Phrase(["spark", "crawl", "data"]))]
        import whoosh_spark.config as C

        for name, q in cases:
            saved_cap = C.PAIR_GATE_MAX_DF
            if name == "phrase_3_sel_pos":
                C.PAIR_GATE_MAX_DF = 0  # force the positional plan
            sp.search(q, limit=10).collect()
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                sp.search(q, limit=10).collect()
                times.append(time.perf_counter() - t0)
            C.PAIR_GATE_MAX_DF = saved_cap
            out[name] = round(statistics.median(times), 3)
            log(f"query {name}: {out[name]}s")
        # optional hot-trigram leg (round 5): the ADVERSARIAL 3-word shape
        # through one "a b c" term lookup — the exact case the payoff gate
        # declines.  Requires the pair leg (shared hot set)
        if os.environ.get("SOAK_TRIGRAMS", "0") == "1":
            t0 = time.perf_counter()
            store.build_pair_segment(spark, ix_dir, pair_min_df=min_df,
                                     phrase_trigrams=True)
            out["trigram_build_wall_s"] = round(
                time.perf_counter() - t0, 1)
            ixt = store.load_index(spark, ix_dir)
            st = Searcher(ixt)
            for name, q in (
                    ("phrase_3_trigram",
                     Q.Phrase(["web", "index", "data"])),
                    ("phrase_3_trigram_freq",
                     Q.Phrase(["web", "index", "data"], scoring="freq"))):
                st.search(q, limit=10).collect()
                times = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    st.search(q, limit=10).collect()
                    times.append(time.perf_counter() - t0)
                out[name] = round(statistics.median(times), 3)
                log(f"query {name}: {out[name]}s")
    return out


def _wand_prune(ix, s, terms: list[str]) -> dict:
    """Survivor-block fraction at the exact final θ for single-term top-10:
    blocks with ub >= θ / total blocks of the term (lower = more pruning)."""
    from pyspark.sql import functions as F

    from whoosh_spark.execution.score import idf_value
    from whoosh_spark.execution.wand import _ub_col
    from whoosh_spark.query import ast as Q

    n, avgdl = ix.global_stats()
    out = {}
    for t in terms:
        stats = ix.stats_for_terms([t])
        if t not in stats:
            continue
        rows = s.search(Q.Term(t), limit=10).collect()
        if len(rows) < 10:
            continue
        theta = float(rows[-1]["score"])
        blocks = ix.blocks.where((F.col("field") == ix.field)
                                 & (F.col("term") == t))
        total = blocks.count()
        idf_map = {t: idf_value(n, stats[t]["df"])}
        surv = blocks.withColumn("_ub", _ub_col(idf_map, avgdl)) \
                     .where(F.col("_ub") >= theta).count()
        out[t] = {"df": stats[t]["df"], "blocks": total,
                  "survivors": surv,
                  "survivor_frac": round(surv / total, 4) if total else None}
        log(f"wand {t}: {surv}/{total} blocks survive θ={theta:.3f}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int,
                    default=int(os.environ.get("SOAK_DOCS", 5_000_000)))
    ap.add_argument("--baseline-docs", type=int,
                    default=int(os.environ.get("SOAK_BASE_DOCS", 1_000_000)))
    ap.add_argument("--keep-index", action="store_true")
    args = ap.parse_args()

    spark = _session()
    try:
        runs = []
        # equal sizes = single-leg mode (e.g. re-running just the 10M leg
        # at its own core/batch config without rebuilding the baseline)
        sizes = ((args.docs,) if args.baseline_docs == args.docs
                 else (args.baseline_docs, args.docs))
        for n in sizes:
            corpus = _ensure_corpus(spark, n)
            r = _build(spark, corpus, n)
            r["queries"] = _queries(spark, r["ix_dir"])
            ix_dir = r.pop("ix_dir")
            if not args.keep_index and n != args.docs:
                shutil.rmtree(ix_dir, ignore_errors=True)
            runs.append(r)
        # merge with any previous soak runs (other corpus sizes) so one
        # crashed/added leg never discards earlier evidence; same-size
        # re-runs replace the stale record
        soak_path = os.path.join(REPO, "SOAK.json")
        if os.path.exists(soak_path):
            try:
                with open(soak_path) as fh:
                    prior = {r["n_docs"]: r
                             for r in json.load(fh).get("runs", [])}
            except (json.JSONDecodeError, KeyError) as exc:
                # a killed previous soak can leave a truncated file — start
                # fresh rather than throwing away THIS run's built evidence
                log(f"ignoring unreadable prior SOAK.json: {exc}")
                prior = {}
            for r in runs:
                prior[r["n_docs"]] = r
            runs = [prior[k] for k in sorted(prior)]
        lo, hi = runs[0], runs[-1]
        scale = hi["n_docs"] / lo["n_docs"]
        result = {
            "protocol": f"local[{CPUS}], vocab_mult={VOCAB_MULT}, persisted "
                        "build (write_index), stage walls from "
                        "_build_log.jsonl, queries warmed median of 3",
            "cores": CPUS,
            "vocab_mult": VOCAB_MULT,
            "runs": runs,
            "scale_factor": scale,
            # superlinearity check: per-doc cost ratio hi/lo per stage
            # (1.0 = perfectly linear; < ~1 = economies of scale)
            "per_doc_cost_ratio": {
                "build": round((hi["build_wall_s"] / hi["n_docs"])
                               / (lo["build_wall_s"] / lo["n_docs"]), 3),
                "analyze": round(
                    (hi["stages"]["analyze_wall_s"] / hi["n_docs"])
                    / (lo["stages"]["analyze_wall_s"] / lo["n_docs"]), 3),
                "merge": round((hi["stages"]["merge_wall_s"] / hi["n_docs"])
                               / (lo["stages"]["merge_wall_s"] / lo["n_docs"]),
                               3),
            },
        }
        # the ratio is only linearity evidence when both legs ran the same
        # config — flag a cross-config comparison instead of asserting it
        if any(lo.get(k) != hi.get(k) for k in ("cores", "arrow_batch")):
            result["per_doc_cost_ratio"]["config_mismatch"] = (
                f"lo ran cores={lo.get('cores')}/batch={lo.get('arrow_batch')}, "
                f"hi cores={hi.get('cores')}/batch={hi.get('arrow_batch')} — "
                "ratios mix config effects with scale effects")
        # atomic tmp+rename: a kill mid-dump must not truncate the merged
        # evidence the next run reads back
        tmp = soak_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(result, fh, indent=1)
        os.replace(tmp, soak_path)
        log("SOAK.json written")
        print(json.dumps(result))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
