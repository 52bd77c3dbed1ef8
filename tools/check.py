#!/usr/bin/env python3
"""Local oracle checker mirroring the driver's DuckDB compare.

Usage: python3 tools/check.py <sfDir> <outDir>
       python3 tools/check.py --survey8 <CORRECTNESS_r0N.json>
       python3 tools/check.py --bench-diff <benchA.json> <benchB.json> \
           [threshold=1.3]

The first form reads each <outDir>/<name> parquet (written by
graft.Verify), runs the matching SQL from <outDir>/oracle_sql.json in
DuckDB against the sfDir tables, sorts columns by name + rows by all
columns, and compares values.

The third form compares two committed bench records CANARY-NORMALIZED
(each query's seconds divided by its run's interleaved-a02 canary
median), so the judge and builder read drift vs regression from the
tool instead of BENCHNOTES prose: raw deltas on this box carry ±15%
host weather (A/A-measured), normalized deltas >1.3x are real. Exits
nonzero if any normalized regression is flagged. Verified against the
r7->r8->r9 history: r7->r8's 97 raw regressions collapse to 8
normalized (m16/st01 = the verdict's accepted planning-cost residuals,
m12 = fixed in r9); r8->r9 shows 260 common, 0.84x raw, 0 flagged —
the r9 verdict's numbers.

The second form emits SURVEY.md section 8's taxonomy block (header
counts + the rows-only table) straight from the driver's correctness
JSON, so the block can never hand-drift from the artifact again: paste
the output over the existing block at round close. A rows-only query
missing from ROWS_ONLY_META prints as UNDOCUMENTED and exits nonzero —
new no_oracle entries must document their twin + spec here first.
"""
import json, math, sys, glob, os

# why each deliberate rows-only query has no oracle, its hash-green
# portable twin, and the named spec gate (the hand-curated columns of
# SURVEY section 8's table; the MEMBERSHIP is machine-checked from the
# JSON, only this metadata is curated)
ROWS_ONLY_META = {
    "a20_sketches": (
        "engine-internal HLL/CMS sketch registers",
        "a20b_sketches_portable, a20c_cms_portable",
        "AggregatesSpec (sketch error bounds)"),
    "d02_minhash_lsh": (
        "XXH64 minhash perms", "d02b_minhash_portable",
        "PipelineOpsSpec (planted near-dups)"),
    "d04_simhash": (
        "XXH64 token hashes", "d04b_simhash_portable",
        "PipelineOpsSpec (hamming recall)"),
    "d07_incremental_dedup": (
        "XXH64 signatures", "d07b_incremental_portable",
        "PipelineOpsSpec (batch-vs-corpus)"),
    "m12_train_metrics": (
        "MLlib LR/RF/GBT fits",
        "m12b_logistic_score (fixed-beta serving), "
        "m12c_tree_score (fixed-structure GBT serving), "
        "m12d_rf_score (fixed-vote RF serving)",
        "MLSpec (M8 metric-parity + m12c/m12d serving-parity gates)"),
    "m13_isotonic": (
        "MLlib IsotonicRegression",
        "m19_isotonic (from-scratch PAV, oracle-green)",
        "CalibrateSpec + MLSpec"),
    "n02_ivf_topk": (
        "MLlib KMeans coarse quantizer", "n02b_ivf_portable",
        "PipelineOpsSpec (recall vs n01 exact)"),
    "n04_cosine_lsh": (
        "Spark-rand hyperplane jitter", "n04b_cosine_lsh_portable",
        "PipelineOpsSpec (planted jitter copies)"),
    "n06_semdedup": (
        "MLlib KMeans quantizer", "n06b_semdedup_portable",
        "PipelineOpsSpec (keep-rule semantics)"),
    "n08_pq_topk": (
        "k-means codebooks", "n08b_pq_portable",
        "PipelineOpsSpec (PQ recall)"),
    "s03_generator": (
        "JVM `rand(seed)`",
        "s03b_generator_portable (md5-derived draws)",
        "GenSpec (5 invariants)"),
    "t16_bpe_tokenize": (
        "iterative merge training (not SQL-expressible)",
        "t16b_bpe_tokenize_portable",
        "PipelineOpsSpec (canonical merge example)"),
    "t32_unigram_train": (
        "Viterbi-EM score re-estimation (`ln` fixed-point)",
        "t33_unigram_segment (fixed-vocab Viterbi, oracle-green)",
        "UnigramSpec (hand-derived EM round + DP)"),
}

def survey8(json_path):
    with open(json_path) as f:
        data = json.load(f)
    total = len(data)
    rows_only = sorted(k for k, v in data.items()
                       if v.get("err") == "no_oracle")
    broken = sorted(k for k, v in data.items()
                    if v.get("err") not in (None, "no_oracle"))
    green = sorted(k for k, v in data.items()
                   if v.get("err") is None and v.get("hash_match"))
    partial = sorted(k for k, v in data.items()
                     if v.get("err") is None and not v.get("hash_match"))
    src = os.path.basename(json_path)
    print(f"**Rows-only taxonomy — generated from `{src}` by "
          "`tools/check.py --survey8`** (the")
    print("driver-facing correctness contract; regenerate this block from "
          "the JSON")
    print(f"each round, do not hand-edit it). The suite ran **{total} "
          "driver")
    print(f"queries: {len(green)} hash-green, {len(rows_only)} rows-only "
          f"(`err: no_oracle`), {len(broken)} broken,")
    print(f"{len(partial)} partial**. Every rows-only entry is deliberate "
          "— its hash key (XXH64),")
    print("RNG (`rand(seed)`), or MLlib fit is not DuckDB-expressible — "
          "and each")
    print("carries BOTH a named ScalaTest spec and, where the pipeline is")
    print("portable, a hash-exact portable twin that IS oracle-green. The")
    print("machine-checkable list (one row per `no_oracle` entry in the "
          "JSON):")
    print()
    print("| rows-only query | non-portable part | hash-green twin | "
          "named spec |")
    print("|---|---|---|---|")
    undocumented = []
    for q in rows_only:
        meta = ROWS_ONLY_META.get(q)
        if meta is None:
            undocumented.append(q)
            print(f"| {q} | UNDOCUMENTED | UNDOCUMENTED | UNDOCUMENTED |")
        else:
            print(f"| {q} | {meta[0]} | {meta[1]} | {meta[2]} |")
    if broken:
        print()
        print(f"BROKEN (must be fixed, not documented): {broken}")
    if partial:
        print()
        print(f"PARTIAL (hash mismatch): {partial}")
    if undocumented:
        print(f"\nERROR: undocumented rows-only queries: {undocumented}",
              file=sys.stderr)
        return 1
    return 1 if (broken or partial) else 0

CAP_RE = None  # compiled lazily (keeps `re` import local to caps())

def caps(repo_root="."):
    """Machine-check the cap -> probe contract (r10 verdict mandate
    #3): every driver query that bounds its input with a literal id
    filter must carry a marker comment AT THE CAP SITE declaring why
    its bench curve still has an asymptote story, and markers that
    claim probe coverage must name a row that exists in SCALEPROBE.md.
    Prevents the next capped query from silently shipping with a
    vacuous-by-construction bench curve.

    Marker grammar (same line or up to two lines above the cap):
      // CAP: queryset                  bounded QUERY side only; the
                                        corpus side is unbounded, so
                                        the driver curve is real
      // CAP: fixture                   fixed-size synthesized fixture
                                        (codec staging); work is
                                        per-doc scan-local
      // CAP: slice cover=<token>       pushed-down entity/id slice;
                                        <token> names the SCALEPROBE
                                        row (query or tools/ probe)
                                        carrying the uncapped story
      // CAP: baseline cover=<token>    exact O(n^2)-ish baseline kept
                                        for the oracle; <token> names
                                        the probed scale path
      // CAP: probe cover=<token>       input cap whose uncapped form
                                        is probed directly
    """
    import re
    cap_re = re.compile(
        r'col\("(?:vec_id|doc_id|user_id|event_id)"\)\s*(?:<|<=)\s*\d')
    mark_re = re.compile(
        r'//\s*CAP:\s*(queryset|fixture|slice|baseline|probe)'
        r'(?:\s+cover=([A-Za-z0-9_./-]+))?')
    qname_re = re.compile(r'"([a-z0-9_]+)" ->')
    probe_text = open(os.path.join(repo_root, "SCALEPROBE.md")).read()
    needs_cover = {"slice", "baseline", "probe"}
    rows, errors = [], []
    files = sorted(glob.glob(os.path.join(
        repo_root, "src/main/scala/graft/queries/*.scala")))
    for path in files:
        lines = open(path).read().splitlines()
        query = None
        for i, ln in enumerate(lines):
            qm = qname_re.search(ln)
            if qm:
                query = qm.group(1)
            if not cap_re.search(ln):
                continue
            mark = None
            for back in range(0, 3):
                if i - back < 0:
                    break
                mm = mark_re.search(lines[i - back])
                if mm:
                    mark = mm
                    break
            loc = f"{os.path.basename(path)}:{i + 1}"
            if mark is None:
                errors.append(f"UNMARKED cap at {loc} (query={query}): "
                              f"{ln.strip()[:70]}")
                continue
            kind, cover = mark.group(1), mark.group(2)
            if kind in needs_cover and not cover:
                errors.append(f"{loc} (query={query}): kind '{kind}' "
                              "requires cover=<token>")
            elif cover and cover not in probe_text:
                errors.append(f"{loc} (query={query}): cover token "
                              f"'{cover}' not found in SCALEPROBE.md")
            rows.append((query or "?", loc, kind, cover or "-"))
    print(f"{'query':34} {'site':28} {'kind':9} cover")
    for q, loc, kind, cover in rows:
        print(f"{q:34} {loc:28} {kind:9} {cover}")
    print(f"== {len(rows)} cap sites, {len(errors)} errors ==")
    for e in errors:
        print("ERROR:", e, file=sys.stderr)
    return 1 if errors else 0

def bench_diff(path_a, path_b, threshold=1.3):
    """Canary-normalized comparison of two Bench records (r9 verdict
    mandate #4): raw per-query seconds on this box drift up to ~1.17x
    between identical-code runs (A/A-measured, BENCHNOTES_r8), so raw
    deltas conflate host weather with regressions. Dividing each
    query's time by the run's interleaved-canary median (a02 runs
    spliced through the suite) cancels the shared host factor; only
    NORMALIZED deltas > threshold are flagged as regressions. Records
    before r9 carry no canary_median — fall back to their single
    a02_grouped_agg time (the same query, sampled once)."""
    def load(p):
        with open(p) as f:
            d = json.load(f)
        if "queries" not in d and isinstance(d.get("parsed"), dict):
            d = d["parsed"]  # driver-wrapped BENCH_r0N.json form
        q = {k: v for k, v in d.get("queries", {}).items() if v > 0}
        canary = d.get("canary_median") or q.get("a02_grouped_agg")
        if not q or not canary:
            raise SystemExit(f"{p}: no usable queries/canary "
                             "(driver-truncated record? use the "
                             "committed bench_summary.json)")
        return q, canary
    qa, ca = load(path_a)
    qb, cb = load(path_b)
    common = sorted(set(qa) & set(qb))
    raw_a = sum(qa[k] for k in common)
    raw_b = sum(qb[k] for k in common)
    print(f"canary A = {ca:.3f}s, canary B = {cb:.3f}s "
          f"(host factor B/A = {cb / ca:.3f})")
    print(f"common queries: {len(common)}  "
          f"(only-A: {len(set(qa) - set(qb))}, "
          f"only-B: {len(set(qb) - set(qa))})")
    print(f"raw common total: {raw_a:.1f}s -> {raw_b:.1f}s "
          f"= {raw_b / raw_a:.2f}x")
    print(f"normalized common total: "
          f"{(raw_b / cb) / (raw_a / ca):.2f}x")
    flagged = []     # normalized regression — real
    absorbed = []    # raw-only regression — host drift, vanishes
    for k in common:
        raw = qb[k] / qa[k]
        norm = (qb[k] / cb) / (qa[k] / ca)
        if norm > threshold:
            flagged.append((norm, raw, k))
        elif raw > threshold:
            absorbed.append((norm, raw, k))
    print(f"raw>={threshold}x but normalized<{threshold}x "
          f"(drift, vanish under the canary): {len(absorbed)}")
    print(f"normalized regressions >{threshold}x: {len(flagged)}")
    for norm, raw, k in sorted(flagged, reverse=True):
        print(f"  REGRESSED {k}: {norm:.2f}x normalized "
              f"({raw:.2f}x raw, {qa[k]:.2f}s -> {qb[k]:.2f}s)")
    return 1 if flagged else 0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def dtype_family(dt):
    """Coarse dtype family. int vs float is a REAL difference (the driver's
    hash is type-sensitive: DuckDB SUM(BIGINT)->HUGEINT->float64 vs Spark
    BIGINT hash-mismatches even when values agree), so int and float are
    distinct families. Width within a family (int32 vs int64) is fine."""
    k = getattr(dt, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "other"

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        return bool(a == b)
    except Exception:
        return False

def main(sf_dir, out_dir, emit_json=None):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    # record one driver-format entry per query so --survey8 can run on
    # a LOCAL verify (the section-8 block regenerates in-round instead
    # of waiting for the next CORRECTNESS_r0N.json). Dumped queries
    # with no oracle SQL are the deliberate rows-only set.
    record = {}
    if emit_json:
        for name in sorted(os.listdir(out_dir)):
            if name.endswith(".json"):
                continue
            if os.path.isdir(os.path.join(out_dir, name)) \
                    and name not in oracle:
                n = len(con.execute(
                    "SELECT * FROM read_parquet(?)",
                    [os.path.join(out_dir, name, "*.parquet")]).fetchdf())
                # rows_match is UNKNOWN for a rows-only dump (no oracle
                # row count to compare against) — recording n > 0 here
                # misreported a legitimately-empty result as unhealthy
                record[name] = {"rows_match": None, "schema_match": None,
                                "hash_match": None, "spark_rows": n,
                                "oracle_rows": None, "err": "no_oracle"}
    def rec(name, ok, g_rows=None, o_rows=None, err=None):
        # schema_match reflects only the column/dtype stages: a hash
        # (cell-diff) failure has, by construction, already passed the
        # column-name, row-count, and dtype-family gates
        record[name] = {
            "rows_match": ok or (g_rows is not None and g_rows == o_rows),
            "schema_match": ok or err == "hash mismatch",
            "hash_match": ok, "spark_rows": g_rows, "oracle_rows": o_rows,
            "err": err}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not res_glob:
            print(f"FAIL {name}: no result parquet")
            rec(name, False, err="no result parquet")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({res_glob!r})").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            rec(name, False, err=str(e)[:200])
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            rec(name, False, len(g), len(e), err="column mismatch")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            rec(name, False, len(g), len(e), err="row count mismatch")
            n_fail += 1
            continue
        dt_bad = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                  if dtype_family(g[c].dtype) != dtype_family(e[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype family mismatch {dt_bad}")
            rec(name, False, len(g), len(e), err="dtype family mismatch")
            n_fail += 1
            continue
        bad = []
        for i in range(len(g)):
            for c in g.columns:
                a, b = g[c].iloc[i], e[c].iloc[i]
                a = None if a is None or (isinstance(a, float) and False) else a
                if not cell_eq(a if a is not None else None, b):
                    bad.append((i, c, a, b))
        # pandas NaN for nulls: treat NaN==NaN above
        if bad:
            print(f"FAIL {name}: {len(bad)} cell diffs, first: {bad[:3]}")
            rec(name, False, len(g), len(e), err="hash mismatch")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            rec(name, True, len(g), len(e))
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if emit_json:
        with open(emit_json, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"wrote {emit_json} ({len(record)} entries)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    if sys.argv[1] == "--survey8":
        sys.exit(survey8(sys.argv[2]))
    if sys.argv[1] == "--caps":
        sys.exit(caps(sys.argv[2] if len(sys.argv) > 2 else "."))
    if sys.argv[1] == "--bench-diff":
        sys.exit(bench_diff(sys.argv[2], sys.argv[3],
                            float(sys.argv[4]) if len(sys.argv) > 4
                            else 1.3))
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
