#!/usr/bin/env python3
"""Large-SF variant of check.py: same compare, plus a per-oracle time
budget. At sf1.0-scale the engine side is fine, but a few DECLARED
brute-force oracles (the O(n^2) pair enumerations DuckDB runs to
verify the dedup/kNN family) cost hours of DuckDB time at 10x rows —
oracle cost, not engine cost (the round-8 sf0.1 sweep precedent).
Those are reported as ORACLE TIMEOUT (budget exceeded) distinctly
from mismatches, and the caller documents them in BENCH.md; every
oracle that completes must still match exactly.

Usage: python3 scripts/check_scale.py <sfDir> <outDir> [budget_s] [keys_csv]
keys_csv (optional) restricts the compare to those result dirs — a
targeted re-proof run (e.g. the round-16 routed dedup keys) must not
count the 291 intentionally-not-dumped oracles as failures.
Exit code = number of MISMATCHES (timeouts excluded, reported).
"""
import json, os, sys, multiprocessing as mp
import duckdb
import pandas as pd

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
budget = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
if len(sys.argv) > 4:
    # Reject a blank keys_csv loudly: {""} matches no result dir and
    # the run would silently compare nothing (round-16 advice).
    only_keys = {k.strip() for k in sys.argv[4].split(",") if k.strip()}
    if not only_keys:
        sys.exit("usage: keys_csv must name at least one query key")
else:
    only_keys = None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)

    def cell(v, is_dt=False):
        if isinstance(v, float):
            if v == 0:
                v = 0.0
            return f"{v:.6f}"
        s = str(v)
        if is_dt and s.endswith(" 00:00:00"):
            return s[:-9]
        return s

    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        is_dt = pd.api.types.is_datetime64_any_dtype(df[c])
        out[c] = df[c].map(lambda v: cell(v, is_dt))
    return out


# Chunked pair-enumeration oracles (round-15 verdict #6): at sf1.0
# q_jaccard_containment's DECLARED oracle exhausted >76 GB of spill
# disk under the 40 GB memory cap — the candidate DISTINCT plus the
# verification GROUP BY hold the full 10x pair volume at once. The
# pair set is PARTITIONED by id1 (= the prefix side's doc_id), so
# running the same SQL K times with `a.doc_id % K = i` injected into
# the candidate join enumerates each pair exactly once (id1 picks its
# chunk), bounds per-run state by ~1/K, and the concatenated union
# re-sorted on (id1, id2) is row-identical to the declared query.
# The linear CTE prefix (tokenize/shingle/prefix) is recomputed per
# chunk — seconds at sf1.0, an accepted K-x overhead for the
# quadratic stage's K-x memory relief. Value = number of chunks.
CHUNKED = {"q_jaccard_containment": 10}

# The injection seam: the candidate join condition as TextKit's
# prefixCandDuck(ordered=false) emits it. Mechanical surgery on the
# DECLARED oracle string (asserted unique) — not a re-implementation.
_CHUNK_SEAM = "ON a.t = b.t AND a.doc_id <> b.doc_id"

# Two-phase chunked oracles (round-17 verdict #4 — sf1.0 waivers
# 2 → 0): q_lof / q_dbscan's downstream CTEs read CROSS-anchor state
# (lof's reach joins the NEIGHBOR's kdist; dbscan's core walk is a
# recursive traversal of the whole core graph), so the single-seam
# row-concat mechanism above cannot apply — a chunk run end-to-end
# would lack kd/core rows for neighbors outside the chunk. Instead:
# phase 1 materializes the quadratic pair STAGE (lof's knn top-5,
# dbscan's ε-neighbor set) chunked on a.vec_id — each anchor's FULL
# b-scan runs inside its own chunk and anchors partition the stage's
# output rows, so the union over chunks is row-identical to the
# declared CTE — and phase 2 runs the DECLARED downstream text
# unchanged against the staged rows. Both phases are mechanical
# surgery on the declared oracle string (markers asserted unique, the
# dbscan `e` CTE re-declaration asserted verbatim-present), never a
# re-implementation. Non-negative modulus as in the single-seam path.
TWO_PHASE = {
    "q_lof": {
        "chunks": 10,
        "seam": "ON a.vec_id <> b.vec_id",
        "stage_end": "knn AS (SELECT a, b, d2 FROM r WHERE rn <= 5),",
        "stage_name": "knn",
        "head": "WITH ",
    },
    "q_dbscan": {
        "chunks": 10,
        "seam": "ON a.vec_id <> b.vec_id",
        "stage_end": "nbr AS (SELECT a, b FROM d WHERE d2 <= 1.34),",
        "stage_name": "nbr",
        # phase 2's final select re-reads `e`; re-declare it with the
        # DECLARED text (presence asserted below).
        "head": ("WITH RECURSIVE e AS (SELECT vec_id,\n"
                 "    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"),
    },
}


def run_two_phase(con, sql, q, spec):
    chunks = spec["chunks"]
    idx = sql.find(spec["stage_end"])
    assert idx >= 0 and sql.count(spec["stage_end"]) == 1, \
        "two-phase stage marker not found exactly once in the declared oracle"
    assert sql.count(spec["seam"]) == 1, \
        "two-phase chunk seam not found exactly once in the declared oracle"
    if spec["head"] != "WITH ":
        assert spec["head"][len("WITH RECURSIVE "):].rstrip(",\n") in sql, \
            "phase-2 CTE re-declaration drifted from the declared oracle"
    prefix = sql[:idx + len(spec["stage_end"])].rstrip()
    assert prefix.endswith("),")
    rest = sql[idx + len(spec["stage_end"]):]
    stage_parts = []
    for i in range(chunks):
        p1 = prefix[:-1].replace(
            spec["seam"],
            f"{spec['seam']} AND ((a.vec_id % {chunks}) + {chunks})"
            f" % {chunks} = {i}") + f"\nSELECT * FROM {spec['stage_name']}"
        stage_parts.append(con.execute(p1).df())
        print(f"  [stage chunk {i + 1}/{chunks}] {len(stage_parts[-1])} rows",
              flush=True)
    stage = pd.concat(stage_parts, ignore_index=True)
    con.register("graft_stage", stage)
    p2 = (spec["head"] +
          f"{spec['stage_name']} AS (SELECT * FROM graft_stage),\n" + rest)
    con.execute(p2).df().to_parquet(q)


def run_oracle(sql, q, chunks=0, two_phase=None):
    """Child process: run one oracle, ship the frame back via parquet."""
    con = duckdb.connect()
    for t in TABLES:
        # Spark-written fixtures are DIRECTORIES of part files; the
        # driver's testdata is one pyarrow file per table.
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    con.execute(f"SET threads TO 16")
    # Bound the child and let it SPILL instead of dying: an unbounded
    # in-memory oracle gets OOM-killed (exit -9) under concurrent
    # load, which reads as ORACLE ERROR instead of an honest
    # timeout/completion (round-14 tally: three -9 kills on the
    # retry arm). 40 GB keeps two children + a Spark driver co-resident
    # on the 128 GB box.
    con.execute("SET memory_limit='40GB'")
    # Per-child spill dir (round-14 advice): DuckDB temp block files
    # are not PID-namespaced, so two co-resident children sharing one
    # '.tmp' can collide on spill file names and corrupt each other's
    # spilled data — a wrong oracle result, worse than the OOM this
    # bound exists to prevent. mkdtemp gives each child its own
    # namespace; best-effort cleanup so retries don't inherit stale
    # spill from a killed sibling.
    import tempfile, shutil
    os.makedirs(".tmp", exist_ok=True)
    spill = tempfile.mkdtemp(prefix="duckdb_spill_", dir=".tmp")
    try:
        con.execute(f"SET temp_directory='{spill}'")
        if two_phase:
            # Two-phase runs are the only child too — same box-wide
            # budget as the single-seam chunked path.
            con.execute("SET memory_limit='100GB'")
            con.execute("SET threads TO 32")
            run_two_phase(con, sql, q, two_phase)
        elif chunks:
            # A chunked oracle runs as the ONLY child (serial outer
            # loop) -- give it the box instead of the 40 GB
            # co-residency cap: the first 40 GB attempt spent 30+ min
            # inside chunk 1 spill-thrashing the candidate DISTINCT
            # while 80+ GB sat idle.
            con.execute("SET memory_limit='100GB'")
            con.execute("SET threads TO 32")
            assert sql.count(_CHUNK_SEAM) == 1, \
                "chunk seam not found exactly once in the declared oracle"
            parts = []
            # Non-negative modulus (round-16 advice): DuckDB's % keeps
            # the dividend's sign, so a raw `doc_id % K = i` silently
            # drops every negative-id pair (no i in 1..K-1 is ever
            # hit). The double-mod form covers the full id domain.
            for i in range(chunks):
                csql = sql.replace(
                    _CHUNK_SEAM,
                    f"{_CHUNK_SEAM} AND ((a.doc_id % {chunks}) + {chunks})"
                    f" % {chunks} = {i}")
                parts.append(con.execute(csql).df())
                print(f"  [chunk {i + 1}/{chunks}] {len(parts[-1])} rows",
                      flush=True)
            pd.concat(parts, ignore_index=True) \
                .sort_values(["id1", "id2"], kind="mergesort") \
                .reset_index(drop=True).to_parquet(q)
        else:
            con.execute(sql).df().to_parquet(q)
    finally:
        shutil.rmtree(spill, ignore_errors=True)


def main():
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))
                   and (only_keys is None or d in only_keys))
    fails, timeouts, ok = [], [], 0
    for name in names:
        rd = os.path.join(out_dir, name)
        # Guard: a scale fixture can make a pair operator's TRUE
        # result quadratic-sized (q_tfidf_pairs at sf1.0: 115 M rows
        # — replica-suffix cliques at the df-screen boundary). The
        # pandas canon compare would OOM; compare count + rounded
        # numeric column sums through DuckDB instead and say so.
        nrows = duckdb.sql(
            f"SELECT count(*) FROM '{rd}/*.parquet'").fetchone()[0]
        if nrows > 2_000_000:
            tmp = f"/tmp/_oracle_{name}.parquet"
            p = mp.Process(target=run_oracle,
                           args=(oracles[name], tmp, CHUNKED.get(name, 0),
                                 TWO_PHASE.get(name)))
            p.start()
            p.join(budget * 4)  # big oracles get a bigger budget
            if p.is_alive():
                p.terminate(); p.join()
                print(f"{name:28s} ORACLE TIMEOUT on {nrows}-row result "
                      f"(> {budget*4:.0f}s)", flush=True)
                timeouts.append(name)
                continue
            def summarize(src):
                cols = duckdb.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()
                nums = [c for c, t, *_ in cols if any(
                    k in t for k in ("INT", "DOUBLE", "FLOAT", "DECIMAL"))]
                # DECIMAL sums: exact and accumulation-order-free
                # (a double sum over 1e8 rows drifts past any fixed
                # rounding).
                sums = ", ".join(
                    "sum(CAST(round(CAST(" + c + " AS DOUBLE), 6) "
                    "AS DECIMAL(38,6)))" for c in nums)
                return duckdb.sql(
                    f"SELECT count(*), {sums} FROM {src}").fetchone()
            got_sum = summarize(f"'{rd}/*.parquet'")
            exp_sum = summarize(f"'{tmp}'")
            os.remove(tmp)
            if got_sum == exp_sum:
                ok += 1
                print(f"{name:28s} OK-LARGE ({nrows} rows; count+sum "
                      "compare, not cell hash)", flush=True)
            else:
                print(f"{name:28s} LARGE MISMATCH got={got_sum} "
                      f"exp={exp_sum}", flush=True)
                fails.append(name)
            continue
        got = pd.read_parquet(rd)
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(got)} rows (no oracle)", flush=True)
            continue
        tmp = f"/tmp/_oracle_{name}.parquet"
        p = mp.Process(target=run_oracle,
                       args=(oracles[name], tmp, CHUNKED.get(name, 0),
                                 TWO_PHASE.get(name)))
        p.start()
        # A chunked oracle trades K-x wall-clock for bounded memory —
        # give it the large-oracle budget.
        p.join(budget * 4 if CHUNKED.get(name) or TWO_PHASE.get(name)
               else budget)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"{name:28s} ORACLE TIMEOUT (> {budget:.0f}s DuckDB — "
                  "declared brute-force oracle cost)", flush=True)
            timeouts.append(name)
            continue
        if p.exitcode != 0 or not os.path.exists(tmp):
            print(f"{name:28s} ORACLE ERROR (exit {p.exitcode})", flush=True)
            fails.append(name)
            continue
        exp = pd.read_parquet(tmp)
        os.remove(tmp)
        gc, ec = canon(got), canon(exp)
        if sorted(got.columns) != sorted(exp.columns):
            print(f"{name:28s} COLUMN MISMATCH spark={sorted(got.columns)} "
                  f"duck={sorted(exp.columns)}", flush=True)
            fails.append(name)
        elif len(gc) != len(ec):
            print(f"{name:28s} ROWCOUNT MISMATCH spark={len(gc)} duck={len(ec)}",
                  flush=True)
            fails.append(name)
        elif not gc.equals(ec):
            diff = (gc != ec).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"{name:28s} VALUE MISMATCH ({diff.sum()} rows); first diffs:",
                  flush=True)
            for i in idx:
                print(f"  row {i}: spark={gc.loc[i].to_dict()}")
                print(f"  row {i}:  duck={ec.loc[i].to_dict()}")
            fails.append(name)
        else:
            ok += 1
            print(f"{name:28s} OK ({len(gc)} rows)", flush=True)
    missing = sorted((set(oracles) if only_keys is None
                      else set(oracles) & only_keys) - set(names))
    for m in missing:
        print(f"{m:28s} NO RESULT PARQUET (query failed?)", flush=True)
        fails.append(m)
    print(f"\n{len(names)} queries: {ok} OK, {len(fails)} mismatches, "
          f"{len(timeouts)} oracle-timeouts {timeouts}")
    sys.exit(min(len(fails), 120))


if __name__ == "__main__":
    main()
