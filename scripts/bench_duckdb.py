#!/usr/bin/env python3
"""Time each gate query's oracle SQL in DuckDB on a given sf dir, and emit
the Spark-vs-DuckDB side-by-side table (BENCH_COMPARE.md).

Usage: python scripts/bench_duckdb.py <sfDir> <verifyOutDir> [benchJson]

- <verifyOutDir> must contain oracle_sql.json (from `runMain graft.Verify`).
- [benchJson] is the one-line bench output (from `runMain graft.Bench`);
  when given, writes BENCH_COMPARE.md next to this repo's root.

Each query runs twice; the second (warm) run is recorded — matching the
Spark bench's warm-up-then-time protocol.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, bench_json=None):
    # --from-artifact (r16, the round-15 verdict's re-pin discipline):
    # read the per-query DuckDB timings from the bench log's own
    # per_query_duckdb line instead of running a SEPARATE comparator
    # draw — the artifact's pairing ran on the same host state as the
    # Spark passes, so BENCH_COMPARE ratios stop depending on a
    # differently-loaded draw. Positional centiseconds over the SORTED
    # query names (the artifact contract).
    from_artifact = out_dir == "--from-artifact"
    if from_artifact:
        per = next((json.loads(l) for l in open(bench_json)
                    if l.startswith("{") and '"per_query_duckdb"' in l), None)
        full = next((json.loads(l) for l in open(bench_json)
                     if l.startswith("{") and '"total_full"' in l), None)
        if per is None or full is None:
            sys.exit(f"--from-artifact needs per_query_duckdb + total_full "
                     f"lines in {bench_json}")
        names = sorted(full["queries"])
        assert len(names) == per["n"], (len(names), per["n"])
        res = {n: cs / 100.0 for n, cs in zip(names, per["duckdb"])
               if cs >= 0}
    else:
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
        res = {}
        for name, sql in sorted(oracle.items()):
            con.sql(sql).fetchall()  # warm-up
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            res[name] = round(time.perf_counter() - t0, 4)
        total = sum(res.values())
        print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                          "unit": "sec", "queries": res, "sf": sf_dir}))
    if not bench_json:
        return 0
    # the bench now emits three JSON lines (total_full, per_query, total);
    # the full-detail line is the one with the name-keyed maps
    bench = next((json.loads(l) for l in open(bench_json)
                  if l.startswith("{") and '"total_full"' in l), None)
    if bench is None:
        sys.exit(f"no total_full line in {bench_json} — old-format or "
                 "truncated bench artifact?")
    spark = bench["queries"]
    cold = bench.get("queries_cold", {})
    stages = bench.get("stages", {})
    floor = bench.get("floor_sec", 0.0)
    lines = ["# BENCH_COMPARE — Spark (local[32]) vs DuckDB (32 threads), "
             f"same parquet at {sf_dir}", "",
             "`cold s` = pass 1 with all plan-keyed caches and result memos "
             "cleared after the JIT warm-up (the operator's real cost); "
             "`spark s` = min of 2 passes (the repeat-consumer cost with "
             "caches/memos live). "
             f"`adj s` = spark s − stages × floor ({floor:.3f}s measured "
             "per-stage scheduling floor): the engine-work residue after "
             "subtracting the per-stage scheduler tax local Spark pays and "
             "a single-process engine does not. On a real cluster the floor "
             "amortizes across executors; `adj` is the honest "
             "work-vs-work comparison, `ratio` the raw wall-clock one.", "",
             "| query | cold s | spark s | stages | adj s | duckdb s "
             "| ratio | adj ratio | cold ratio |",
             "|---|---|---|---|---|---|---|---|---|"]
    tot_adj = 0.0
    for name in sorted(spark, key=lambda n: -spark[n]):
        d = res.get(name)
        st = stages.get(name, 0)
        adj = max(0.0, spark[name] - st * floor)
        if d is not None:  # totals must compare the same query set
            tot_adj += adj
        c = cold.get(name)
        cs = f"{c:.3f}" if c is not None else "-"
        ds = f"{d:.3f}" if d is not None else "(no oracle)"
        rs = f"{spark[name] / d:.1f}x" if d else "-"
        ar = f"{adj / d:.1f}x" if d else "-"
        cr = f"{c / d:.1f}x" if (d and c is not None) else "-"
        lines.append(f"| {name} | {cs} | {spark[name]:.3f} | {st} "
                     f"| {adj:.3f} | {ds} | {rs} | {ar} | {cr} |")
    tot_s = sum(spark.values())
    tot_c = sum(cold.get(n, spark[n]) for n in spark)
    tot_d = sum(d for n, d in res.items() if n in spark)
    lines.append(f"| **total** | **{tot_c:.2f}** | **{tot_s:.2f}** | "
                 f"| **{tot_adj:.2f}** "
                 f"| **{tot_d:.2f}** ({len(res)} of {len(spark)}) "
                 f"| **{tot_s / tot_d:.1f}x** | **{tot_adj / tot_d:.1f}x** "
                 f"| **{tot_c / tot_d:.1f}x** |")
    with open("BENCH_COMPARE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
