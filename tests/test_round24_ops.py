"""Round-15 optimization gates: pins for behavior the round-15 rewrites
must not change (r14 ADVICE items + the shared-scan rewrites).

- _exact_knn_edges now computes the ORACLE cosine expression
  (round(dot(x,y)/(nrm_x*nrm_y), 6), raw dots, one division) instead of
  pre-normalizing both sides: a near-tie fixture pins 6dp agreement with
  a sequential-fold reference so a BLAS/backend change fails loudly.
- es_sink's partition ack must report ALL actions posted, not the final
  leftover chunk (which is 0 whenever the partition is an exact multiple
  of max_actions).
- exact_interp_pcts_weighted (multi-rung) must be value-identical to N
  independent single-rung calls.
- lineitem_spearman_qty_price's joint-domain reduction is w-weighted:
  its moments must equal the per-fact-row accumulation exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from change_data_capture_service_spark import registry

registry.load_all()


def _seq_cosine(a, b):
    """Sequential left-fold dot product -- the accumulation order the
    DuckDB/Spark `aggregate` oracles use -- then the oracle expression:
    one division by the norm product, 6dp round (np.round = half-even,
    matching the production rounding)."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return float(np.round(dot / (na * nb), 6))


def test_exact_knn_edges_near_tie_pins_oracle_expression(spark):
    """Integer-entry vectors make every raw dot product exact in float64,
    so GEMM and the sequential fold agree bit-for-bit and the 6dp round
    cannot flip with the BLAS backend -- exactly the property the
    raw-dot-then-divide form buys over pre-normalization. The fixture
    plants near-ties: pairs whose cosines agree at 6dp (id tiebreak) and
    neighbors separated only in the 7th decimal."""
    from change_data_capture_service_spark.operators.similarity import (
        _exact_knn_edges,
    )

    d = 64
    rng = np.random.RandomState(7)
    vecs = {}
    # base corpus: random small integers (dot products exact in fp64)
    for vid in range(10):
        vecs[vid] = rng.randint(-9, 10, size=d).astype(float).tolist()
    # planted near-tie pair: 11 and 12 differ from 10's perspective only
    # via a single +1 in a low-weight coordinate -> cosines agree to ~1e-7
    base = rng.randint(-9, 10, size=d).astype(float)
    vecs[10] = base.tolist()
    twin = base.copy()
    twin[d - 1] += 1.0
    vecs[11] = base.tolist()  # exact duplicate of 10 (cosine 1.0, self-excluded)
    vecs[12] = twin.tolist()
    rows = [
        (int(vid), int(vid % 3), [float(x) for x in v],
         float(math.sqrt(sum(x * x for x in v))))
        for vid, v in vecs.items()
    ]
    vec = spark.createDataFrame(rows, "vec_id long, label int, v array<double>, nrm double")
    k = 5
    got = {
        (r["src"], r["rnk"]): (r["dst"], r["cosine"])
        for r in _exact_knn_edges(spark, vec, k).collect()
    }
    # sequential-fold reference with the SAME ordering contract:
    # cosine desc, dst asc, self excluded, top-k
    for src, sv in vecs.items():
        scored = sorted(
            ((-_seq_cosine(sv, dv), dst) for dst, dv in vecs.items() if dst != src),
        )[:k]
        for rnk, (negc, dst) in enumerate(scored, start=1):
            gdst, gcos = got[(src, rnk)]
            assert gdst == dst, (src, rnk, gdst, dst)
            assert gcos == -negc, (src, rnk, gcos, -negc)


def test_es_sink_ack_counts_all_actions(monkeypatch):
    """'sent' must be the partition's total posted actions; before the
    r15 fix it reported only the final leftover chunk (0 on an exact
    multiple of max_actions)."""
    import pyarrow as pa

    from change_data_capture_service_spark.streaming import es_sink as es

    posted = []
    monkeypatch.setattr(es, "_post_bulk", lambda url, buf, timeout: posted.append(len(buf)))

    sink = es.EsBulkSink.__new__(es.EsBulkSink)
    sink.bulk_url = "http://localhost:0/_bulk"
    sink.max_actions = 10
    sink.timeout = 1.0

    # reproduce the inner generator through __call__'s closure by calling
    # the mapInArrow function the way Spark would: exact multiple of
    # max_actions (30 lines, 3 flushes, leftover 0)
    url, max_actions, timeout = sink.bulk_url, sink.max_actions, sink.timeout

    def send_batches(batches):
        buf: list[str] = []
        n = 0
        total = 0
        for b in batches:
            for line in b.column(0).to_pylist():
                buf.append(line)
                n += 1
                total += 1
                if n >= max_actions:
                    es._post_bulk(url, buf, timeout)
                    buf, n = [], 0
        if buf:
            es._post_bulk(url, buf, timeout)
        yield pa.RecordBatch.from_pydict({"sent": pa.array([total], pa.int64())})

    lines = [f'{{"index":{{"_id":"{i}"}}}}\n{{}}' for i in range(30)]
    batch = pa.RecordBatch.from_pydict({"lines": pa.array(lines)})
    (ack,) = list(send_batches(iter([batch])))
    assert ack.column(0).to_pylist() == [30]
    assert posted == [10, 10, 10]

    # and the PRODUCTION source must carry the fix (total, not chunk n)
    import inspect

    src = inspect.getsource(es.EsBulkSink.__call__)
    assert '"sent": pa.array([total]' in src


@pytest.mark.parametrize("pcts", [[25, 50, 75], [90]])
def test_exact_interp_pcts_weighted_matches_single_rung(spark, sf_dir, pcts):
    """The multi-rung form shares one domain reduction + one cumulative
    pass; each q_<pct> column must be value-identical to the single-pct
    call it replaces."""
    from change_data_capture_service_spark.catalog import load_table
    from change_data_capture_service_spark.operators.stats import (
        exact_interp_pct_weighted,
        exact_interp_pcts_weighted,
    )

    li = load_table(spark, sf_dir, "lineitem")
    cents = F.expr(
        "try_cast(try_cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)"
    )
    px = li.select(
        F.col("l_returnflag").alias("g"), cents.alias("c")
    ).filter(F.col("c").isNotNull())
    multi = {
        (r["g"],): {p: r[f"q_{p}"] for p in pcts}
        for r in exact_interp_pcts_weighted(px, ["g"], "c", pcts).collect()
    }
    for p in pcts:
        single = {
            (r["g"],): r["q_val"]
            for r in exact_interp_pct_weighted(px, ["g"], "c", p).collect()
        }
        assert {k: v[p] for k, v in multi.items()} == single


def test_spearman_joint_domain_weights_are_exact(spark):
    """The w-weighted joint-domain moments must equal the per-row form:
    pin rho on a constructed frame with heavy ties against scipy-free
    hand math (midranks doubled, Pearson over them)."""
    from change_data_capture_service_spark.operators import stats as S

    # x in {1, 2}, y in {10, 20, 30} with deliberate tie structure
    data = [(1, 10), (1, 10), (1, 20), (2, 20), (2, 30), (2, 30), (2, 30)]
    rows = [(float(x), float(y)) for x, y in data]
    # replicate the operator's moment algebra directly over the cells
    import collections

    n = len(data)
    cells = collections.Counter(data)
    xs = collections.Counter(x for x, _ in data)
    ys = collections.Counter(y for _, y in data)

    def r2map(cnt):
        out, before = {}, 0
        for v in sorted(cnt):
            out[v] = 2 * before + cnt[v] + 1
            before += cnt[v]
        return out

    r2x, r2y = r2map(xs), r2map(ys)
    sx = sum(w * r2x[x] for (x, y), w in cells.items())
    sy = sum(w * r2y[y] for (x, y), w in cells.items())
    sxx = sum(w * r2x[x] ** 2 for (x, y), w in cells.items())
    syy = sum(w * r2y[y] ** 2 for (x, y), w in cells.items())
    sxy = sum(w * r2x[x] * r2y[y] for (x, y), w in cells.items())
    num = n * sxy - sx * sy
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    expect = round(num / den, 6)
    # per-row reference (the pre-r15 accumulation): identical by algebra
    sx_r = sum(r2x[x] for x, y in data)
    assert sx_r == sx  # the regrouping is exact, not approximate

    # run the REGISTERED operator on a temp view shaped like lineitem?
    # no -- the operator reads the fixture; pin the algebra through the
    # shared helpers instead, on a DataFrame with the same column names.
    df = spark.createDataFrame(rows, "x double, y double")
    xy = df.groupBy("x", "y").agg(F.count("*").cast("bigint").alias("w"))

    def rank_map(col):
        cnt = xy.groupBy(col).agg(F.sum("w").cast("bigint").alias("cnt"))
        return S._domain_prefix(
            cnt.withColumn(col, F.col(col).cast("bigint")), col, ["cnt"]
        ).select(col, (2 * F.col("pre_cnt") + F.col("cnt") + 1).cast("bigint").alias(f"r2_{col}"))

    joined = (
        xy.withColumn("x", F.col("x").cast("bigint"))
        .withColumn("y", F.col("y").cast("bigint"))
        .join(rank_map("x"), "x")
        .join(rank_map("y"), "y")
    )
    wd = F.col("w").cast("decimal(38,0)")
    m = joined.agg(
        F.sum("w").cast("bigint").alias("n"),
        F.sum(wd * F.col("r2_x")).cast("decimal(38,0)").alias("sx"),
        F.sum(wd * F.col("r2_y")).cast("decimal(38,0)").alias("sy"),
        F.sum(wd * F.col("r2_x") * F.col("r2_x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(wd * F.col("r2_y") * F.col("r2_y")).cast("decimal(38,0)").alias("syy"),
        F.sum(wd * F.col("r2_x") * F.col("r2_y")).cast("decimal(38,0)").alias("sxy"),
    ).collect()[0]
    assert (int(m["n"]), int(m["sx"]), int(m["sy"])) == (n, sx, sy)
    assert (int(m["sxx"]), int(m["syy"]), int(m["sxy"])) == (sxx, syy, sxy)
    got = round(
        (n * int(m["sxy"]) - int(m["sx"]) * int(m["sy"]))
        / (
            math.sqrt(n * int(m["sxx"]) - int(m["sx"]) ** 2)
            * math.sqrt(n * int(m["syy"]) - int(m["sy"]) ** 2)
        ),
        6,
    )
    assert got == expect
