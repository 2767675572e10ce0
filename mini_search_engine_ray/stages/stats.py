"""Distributed per-group descriptive statistics.

Simple linear regression + Pearson correlation per group, computed with
ONE narrow partial-sums exchange: each batch locally combines its rows
into one (key, n, Σx, Σx², Σy, Σxy, Σy²) row per (batch, key), the
global reduction is a ``sorted_groupby_agg`` sum over those partials
(group-bounded rows per batch, never event-sized), and the closed-form
finalize is a pure vectorized map.  This is the classic "sufficient
statistics travel, rows don't" plan — the same shape a 256-node
cluster wants at 100 TB, because the shuffle carries seven numbers per
(batch, key) regardless of group size.

Exactness contract: when ``x_col`` is an INTEGER column the Σx / Σx²
partials stay int64 end to end, so the regression denominator
``n·Σx² − (Σx)²`` is bit-exact and the SQL oracle's keep/drop decision
(``denom > 0``) replays deterministically; only Σy / Σxy / Σy² carry
IEEE summation-order drift (gated at 4 decimals by the driver
queries).  int64 overflow bound: |x| ≤ X ⇒ Σx² is exact while
rows-per-group · X² < 2⁶³ (e.g. X = 86 400 ⇒ ~1.2×10⁹ rows/group);
callers with unbounded x pass a float column and accept float sums.

Semantic anchor: the classical two-pass-free closed forms
slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), intercept = (Σy − slope·Σx)/n,
r = (nΣxy − ΣxΣy) / √((nΣx² − (Σx)²)(nΣy² − (Σy)²)) — the engine and
the DuckDB oracle both evaluate these EXPLICIT formulas over exact
integer / drift-gated float sums rather than relying on the engines'
(differently implemented, numerically-stabilized) ``regr_slope`` /
``corr`` builtins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .aggregates import sorted_groupby_agg, static_schema

__all__ = ["association_stats", "cohens_kappa", "drift_stats", "drift_stats_by_group", "grouped_linear_stats", "key_skew_stats", "kl_by_group", "roc_auc"]


def grouped_linear_stats(ds, *, key_col: str, x_col: str, y_col: str):
    """Per-group simple linear regression of ``y_col`` on ``x_col``.

    Returns a Dataset with one row per group that has n ≥ 2 rows AND a
    strictly positive x-variance (``n·Σx² − (Σx)² > 0`` — the SQL
    keep/drop mirror), columns::

        key_col    group key (input type; int or string)
        n          int64 row count
        slope      least-squares slope      (double)
        intercept  least-squares intercept  (double)
        corr       Pearson r, NULL when the y-variance is ≤ 0
                   (constant y)             (double)

    NULLs in key/x/y raise loudly (same contract as the scan family):
    SQL aggregates silently skip NULL x/y while ``count(*)`` doesn't,
    so a null would silently diverge from the oracle instead of
    failing — filter or fill first.
    """
    schema = static_schema(ds)
    key_t = schema.field(key_col).type if (
        schema is not None and key_col in schema.names) else pa.int64()
    x_int = bool(
        schema is not None and x_col in schema.names
        and pa.types.is_integer(schema.field(x_col).type))
    sx_t = pa.int64() if x_int else pa.float64()

    part_schema = pa.schema([
        (key_col, key_t), ("n", pa.int64()), ("sx", sx_t), ("sxx", sx_t),
        ("sy", pa.float64()), ("sxy", pa.float64()), ("syy", pa.float64()),
    ])

    def _np(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            raise ValueError(
                "grouped_linear_stats: NULLs in key/x/y would silently "
                "diverge from SQL (sum skips NULL, count(*) doesn't) — "
                "filter or fill first")
        return col.to_numpy(zero_copy_only=False)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        key = t[key_col]
        key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) \
            else key
        if key.null_count:
            raise ValueError("grouped_linear_stats: NULL group key")
        kd = key.dictionary_encode()
        codes = kd.indices.to_numpy(zero_copy_only=False)
        if x_int:
            x = _np(t[x_col]).astype(np.int64)
            xx = x * x
        else:
            x = _np(t[x_col]).astype(np.float64)
            xx = x * x
        y = _np(t[y_col]).astype(np.float64)
        order = np.argsort(codes, kind="stable")
        c = codes[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        seg = lambda v: np.add.reduceat(v[order], starts)  # noqa: E731
        n = np.diff(np.r_[starts, len(c)]).astype(np.int64)
        xs, ys = x.astype(np.float64), y
        return pa.table({
            key_col: kd.dictionary.take(pa.array(c[starts])),
            "n": pa.array(n),
            "sx": pa.array(seg(x)),
            "sxx": pa.array(seg(xx)),
            "sy": pa.array(seg(y)),
            "sxy": pa.array(seg(xs * ys)),
            "syy": pa.array(seg(ys * ys)),
        })

    agg = sorted_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col],
        [("n", "sum", "n"), ("sx", "sum", "sx"), ("sxx", "sum", "sxx"),
         ("sy", "sum", "sy"), ("sxy", "sum", "sxy"),
         ("syy", "sum", "syy")],
        in_schema=part_schema)

    out_schema = pa.schema([
        (key_col, key_t), ("n", pa.int64()), ("slope", pa.float64()),
        ("intercept", pa.float64()), ("corr", pa.float64()),
    ])

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        sxy = t["sxy"].to_numpy(zero_copy_only=False)
        syy = t["syy"].to_numpy(zero_copy_only=False)
        denom = n * sxx - sx * sx
        keep = (n >= 2) & (denom > 0)
        n, sx, sy, sxy, syy, denom = (
            v[keep] for v in (n, sx, sy, sxy, syy, denom))
        num = n * sxy - sx * sy
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = num / denom
            intercept = (sy - slope * sx) / n
            vary = n * syy - sy * sy
            corr = np.where(vary > 0, num / np.sqrt(denom * vary), np.nan)
        key = t[key_col]
        key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) \
            else key
        return pa.table({
            key_col: key.filter(pa.array(keep)),
            "n": pa.array(n.astype(np.int64)),
            "slope": pa.array(slope),
            "intercept": pa.array(intercept),
            "corr": pa.array(corr, mask=~(vary > 0)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def _contingency_cells(ds, a_col: str, b_col: str, op_name: str):
    """Shared contingency plan: per-batch local (a, b, cnt) partials
    (one width-coded np.unique per batch), ONE grouped sum bounded by
    |A|·|B| cells, contingency-bounded driver collect.  Returns the
    collected cell Table (a, b, cnt) or None when the input is
    empty."""
    from .aggregates import sorted_groupby_agg

    cnt_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                            ("cnt", pa.int64())])

    def local_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cnt_schema.empty_table()
        a = t[a_col]
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        b = t[b_col]
        b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
        if a.null_count or b.null_count:
            raise ValueError(f"{op_name}: NULL category")
        da, db = a.dictionary_encode(), b.dictionary_encode()
        ca = da.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cb = db.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        width = len(db.dictionary)
        code = ca * width + cb
        u, cnt = np.unique(code, return_counts=True)
        return pa.table({
            "a": da.dictionary.take(pa.array(u // width)),
            "b": db.dictionary.take(pa.array(u % width)),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    cells = sorted_groupby_agg(
        ds.map_batches(local_counts, batch_format="pyarrow"),
        ["a", "b"], [("cnt", "sum", "cnt")], in_schema=cnt_schema)
    tabs = [b for b in cells.iter_batches(batch_format="pyarrow")
            if b.num_rows and "a" in b.column_names]
    return pa.concat_tables(tabs) if tabs else None


def association_stats(ds, *, a_col: str, b_col: str):
    """Categorical association between two columns: the chi-square
    independence statistic, mutual information (nats) and Cramér's V
    over the (a, b) contingency table — the data-quality test every
    feature-selection / leakage audit runs (Pearson 1900; Cramér
    1946; Cover & Thomas MI).

    Plan: per-batch local (a, b, cnt) partials → ONE grouped sum
    bounded by |A|·|B| cells (the contingency table IS the scale
    contract: categorical alphabets, not rows, bound the exchange) →
    the cell table collects onto the driver (|A|·|B| rows by
    contract) where the closed forms are evaluated in one vectorized
    pass:

      chi2 = Σ_observed (o − r_a·c_b/n)² / (r_a·c_b/n)  +  (n − Σ_observed e)
             (the second term is EXACTLY the unobserved cells'
              Σ (0−e)²/e = Σe contribution, since Σ_all e = n —
              no dense table is ever built)
      mi   = Σ_observed (o/n) · ln(o·n / (r_a·c_b))
      v    = √(chi2 / (n · (min(|A|,|B|) − 1)))

    with o, r_a, c_b, n all EXACT int64 (marginals derived from the
    cells, so no second pass) and only the final float expressions
    carrying the usual summation-order drift (callers gate at 4dp).
    Returns a ONE-ROW Dataset (n, cells, dof, chi2, mi, cramers_v);
    degenerate single-category inputs (dof = 0) return chi2 = 0,
    mi = 0, cramers_v = NULL (the SQL NULL division)."""
    import ray.data as rd

    out_schema = pa.schema([
        ("n", pa.int64()), ("cells", pa.int64()), ("dof", pa.int64()),
        ("chi2", pa.float64()), ("mi", pa.float64()),
        ("cramers_v", pa.float64())])
    tab = _contingency_cells(ds, a_col, b_col, "association_stats")
    if tab is None:
        return rd.from_arrow(out_schema.empty_table())
    a_codes = tab["a"].dictionary_encode().combine_chunks()
    b_codes = tab["b"].dictionary_encode().combine_chunks()
    ia = a_codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ib = b_codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    o = tab["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(o.sum())
    ka = int(ia.max()) + 1
    kb = int(ib.max()) + 1
    ra_tot = np.zeros(ka, np.int64)   # int64-exact marginals (a float
    np.add.at(ra_tot, ia, o)          # bincount would round above 2^53)
    cb_tot = np.zeros(kb, np.int64)
    np.add.at(cb_tot, ib, o)
    ra, cb = ra_tot[ia], cb_tot[ib]
    # closed forms over exact int64 cells; float only at the end
    e = ra.astype(np.float64) * cb.astype(np.float64) / float(n)
    # cells with o = 0 never reach the grouped count but contribute
    # (0 - e)²/e = e to chi²; since Σ_all e = n, their total is
    # exactly n - Σ_observed e — no dense table needed
    chi2 = float(np.sum((o - e) ** 2 / e) + (n - float(np.sum(e))))
    mi = float(np.sum((o / n) * np.log(o.astype(np.float64) * n
                                       / (ra.astype(np.float64) * cb))))
    dof = (ka - 1) * (kb - 1)
    denom = n * (min(ka, kb) - 1)
    v = float(np.sqrt(chi2 / denom)) if denom > 0 else None
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "cells": pa.array([len(o)], pa.int64()),
        "dof": pa.array([dof], pa.int64()),
        "chi2": pa.array([chi2], pa.float64()),
        "mi": pa.array([mi], pa.float64()),
        "cramers_v": pa.array([v], pa.float64()),
    }))


def cohens_kappa(ds, *, a_col: str, b_col: str):
    """Inter-rater agreement (Cohen 1960) between two label columns —
    the metric every labeling / weak-supervision audit reports:
    κ = (p_o − p_e) / (1 − p_e) with p_o the observed agreement and
    p_e the chance agreement from the marginals.  Same contingency
    plan as :func:`association_stats` (|A|·|B|-bounded exchange +
    collect); every sum is EXACT int64 — agree = Σ o[a == b],
    chance = Σ_label r_l·c_l — so p_o = agree/n and p_e = chance/n²
    are each ONE IEEE division and κ one fixed expression: fully
    deterministic, no summation-order drift anywhere.  Returns a
    one-row Dataset (n, agree, po, pe, kappa); κ is NULL when
    p_e = 1 (both columns a single identical label)."""
    import ray.data as rd

    out_schema = pa.schema([
        ("n", pa.int64()), ("agree", pa.int64()), ("po", pa.float64()),
        ("pe", pa.float64()), ("kappa", pa.float64())])
    tab = _contingency_cells(ds, a_col, b_col, "cohens_kappa")
    if tab is None:
        return rd.from_arrow(out_schema.empty_table())
    a = tab["a"].to_pylist()
    b = tab["b"].to_pylist()
    o = tab["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(o.sum())
    agree = int(o[[x == y for x, y in zip(a, b)]].sum()) if len(o) else 0
    ra: dict = {}
    cb: dict = {}
    for x, y, c in zip(a, b, o.tolist()):
        ra[x] = ra.get(x, 0) + c
        cb[y] = cb.get(y, 0) + c
    chance = sum(ra[l] * cb.get(l, 0) for l in ra)  # exact int64
    po = agree / n
    pe = chance / (n * n)
    kappa = (po - pe) / (1.0 - pe) if pe != 1.0 else None
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "agree": pa.array([agree], pa.int64()),
        "po": pa.array([po], pa.float64()),
        "pe": pa.array([pe], pa.float64()),
        "kappa": pa.array([kappa], pa.float64()),
    }))


def key_skew_stats(ds, *, key_col: str):
    """Key-distribution skew report — the diagnostic that decides
    whether a join/groupby needs the salted path: one row
    (n_keys, n_rows, max_cnt, max_share, gini) over the per-key row
    counts.  Gini uses the rank form
    G = (2·Σ i·c_(i) − (n+1)·Σc) / (n·Σc) over counts sorted
    ascending (ties by key, so the ranking is total and both engines
    agree); Σ i·c_i stays EXACT int64 via the existing row-number
    scan, so every reported float is a fixed expression over exact
    integers — no drift.  Exchanges: one key-sized grouped count, one
    counts-sized range sort (the row-number carry), one scalar-partial
    grouped sum."""
    import ray.data as rd

    from .aggregates import sorted_groupby_agg
    from .scan import running_agg

    key_schema_in = static_schema(ds)
    cnt_schema = pa.schema([
        ("k", key_schema_in.field(key_col).type
         if key_schema_in is not None and key_col in key_schema_in.names
         else pa.int64()),
        ("cnt", pa.int64())])

    def proj(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cnt_schema.empty_table()
        k = t[key_col]
        k = k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
        if k.null_count:
            raise ValueError("key_skew_stats: NULL key")
        return pa.table({"k": k})

    counts = sorted_groupby_agg(
        ds.map_batches(lambda t: proj(t), batch_format="pyarrow"),
        ["k"], [("k", "count", "cnt")],
        in_schema=pa.schema([("k", cnt_schema.field("k").type)]))

    ranked = running_agg(counts, order_by=["cnt", "k"], op="count",
                         out_col="i")

    part_schema = pa.schema([
        ("_g", pa.int64()), ("nk", pa.int64()), ("s0", pa.int64()),
        ("s1", pa.int64()), ("mx", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cnt" not in t.column_names:
            return part_schema.empty_table()
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = t["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"_g": pa.array([0], pa.int64()),
                         "nk": pa.array([len(c)], pa.int64()),
                         "s0": pa.array([int(c.sum())], pa.int64()),
                         "s1": pa.array([int((i * c).sum())], pa.int64()),
                         "mx": pa.array([int(c.max())], pa.int64())})

    agg = sorted_groupby_agg(
        ranked.map_batches(partials, batch_size=None,
                           batch_format="pyarrow"),
        ["_g"],
        [("nk", "sum", "nk"), ("s0", "sum", "s0"), ("s1", "sum", "s1"),
         ("mx", "max", "mx")], in_schema=part_schema)

    out_schema = pa.schema([
        ("n_keys", pa.int64()), ("n_rows", pa.int64()),
        ("max_cnt", pa.int64()), ("max_share", pa.float64()),
        ("gini", pa.float64())])

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "nk" not in t.column_names:
            return out_schema.empty_table()
        nk = int(t["nk"][0].as_py())
        s0 = int(t["s0"][0].as_py())
        s1 = int(t["s1"][0].as_py())
        mx = int(t["mx"][0].as_py())
        gini = (2 * s1 - (nk + 1) * s0) / (nk * s0)
        return pa.table({
            "n_keys": pa.array([nk], pa.int64()),
            "n_rows": pa.array([s0], pa.int64()),
            "max_cnt": pa.array([mx], pa.int64()),
            "max_share": pa.array([mx / s0], pa.float64()),
            "gini": pa.array([gini], pa.float64()),
        })

    return agg.map_batches(fin, batch_size=None, batch_format="pyarrow")


def drift_stats(ds, *, value_col: str, ts_col: str, split_us: int,
                lo_cents: int, hi_cents: int, bins: int = 32):
    """Distribution drift between two time periods — the monitoring
    check every production ML pipeline runs on its features: the
    Population Stability Index (PSI, the banking-scorecard standard)
    and the two-sample Kolmogorov–Smirnov statistic over a fixed
    integer histogram.

    Values bucket as exact integers: ``cents = floor(value·100)``,
    ``bucket = clip((cents − lo)·bins // (hi − lo), 0, bins−1)`` —
    every boundary decision is int64 on both engines.  Period A is
    ``ts < split_us``; B the rest.  With add-one (Laplace) smoothing
    the PSI term probabilities are exact rationals
    ``p_i = (n_aᵢ + 1)/(n_a + bins)``, so each term is two IEEE
    divisions + one ln, and only the Σ over the (fixed, small) bin
    set carries order drift (callers gate 4dp).  The KS statistic's
    ARGMAX is selected with pure integers
    (``|cum_aᵢ·n_b − cum_bᵢ·n_a|``) before the single normalizing
    division, so the maximizing bucket is deterministic.

    Exchanges: per-batch (bucket, period) bincount partials → ONE
    bins-bounded grouped sum → bins-bounded collect + closed form.
    Returns a one-row Dataset (n_a, n_b, psi, ks, ks_bucket);
    requires both periods non-empty (raises otherwise — drift against
    an empty period is undefined)."""
    import ray.data as rd

    if not (isinstance(bins, int) and bins >= 2):
        raise ValueError(f"bins must be an int >= 2, got {bins!r}")
    if not hi_cents > lo_cents:
        raise ValueError("hi_cents must exceed lo_cents")
    span = hi_cents - lo_cents

    part_schema = pa.schema([("bucket", pa.int64()), ("period", pa.int64()),
                             ("cnt", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        v = t[value_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col]
        ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        us = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(v * 100).astype(np.int64)
        b = np.clip((cents - lo_cents) * bins // span, 0, bins - 1)
        per = (us >= split_us).astype(np.int64)
        code = b * 2 + per
        cnt = np.bincount(code, minlength=2 * bins).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz // 2),
                         "period": pa.array(nz % 2),
                         "cnt": pa.array(cnt[nz])})

    agg = sorted_groupby_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["bucket", "period"], [("cnt", "sum", "cnt")],
        in_schema=part_schema)

    out_schema = pa.schema([
        ("n_a", pa.int64()), ("n_b", pa.int64()), ("psi", pa.float64()),
        ("ks", pa.float64()), ("ks_bucket", pa.int64())])

    na_i = np.zeros(bins, np.int64)
    nb_i = np.zeros(bins, np.int64)
    for t in agg.iter_batches(batch_format="pyarrow"):  # bins-bounded
        if t.num_rows == 0 or "bucket" not in t.column_names:
            continue
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        pr = t["period"].to_numpy(zero_copy_only=False)
        cn = t["cnt"].to_numpy(zero_copy_only=False)
        np.add.at(na_i, bk[pr == 0], cn[pr == 0])
        np.add.at(nb_i, bk[pr == 1], cn[pr == 1])
    n_a, n_b = int(na_i.sum()), int(nb_i.sum())
    if n_a == 0 or n_b == 0:
        raise ValueError("drift_stats: a period is empty — drift "
                         "against an empty period is undefined")
    p = (na_i + 1).astype(np.float64) / float(n_a + bins)
    q = (nb_i + 1).astype(np.float64) / float(n_b + bins)
    psi = float(np.sum((p - q) * np.log(p / q)))
    ca, cb = np.cumsum(na_i), np.cumsum(nb_i)
    gap = np.abs(ca * n_b - cb * n_a)          # exact int64 selection
    k = int(np.argmax(gap))                    # first max: smallest i
    ks = float(gap[k]) / (float(n_a) * float(n_b))
    return rd.from_arrow(pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "psi": pa.array([psi], pa.float64()),
        "ks": pa.array([ks], pa.float64()),
        "ks_bucket": pa.array([k], pa.int64()),
    }))


def roc_auc(ds, *, score_col: str, label_col: str):
    """Exact tie-aware ROC AUC of an integer score ranking a binary
    label — the Mann-Whitney rank-sum identity every offline model
    evaluation computes:

      AUC = [ Σ_s pos_s · cumneg_{<s}  +  ½ Σ_s pos_s · neg_s ]
            / (n_pos · n_neg)

    over DISTINCT score values s ascending (pairs where the positive
    outranks the negative count 1, ties count ½).  The engine keeps
    the numerator a PURE INTEGER (`numer2 = Σ pos·(2·cumneg + neg)`,
    Python-int accumulated so it cannot overflow at any scale) and
    performs the ONE normalizing division at the end, so the value is
    deterministic and the SQL oracle replays it with window cumsums.

    Exactness contract: ``score_col`` must be an integer column (cast
    floats to fixed-point cents upstream — float group-equality is
    engine-dependent); ``label_col`` must be 0/1 int.

    Exchanges: per-batch (score → pos, neg) bincount partials → ONE
    distinct-score-bounded grouped sum (sort-based, so its output
    blocks are globally score-ordered) → a STREAMING ordered sweep on
    the driver holding one batch + an O(1) carry (cumneg, numer2) —
    nothing distinct-score-sized is ever materialized at once.
    Raises when either class is empty (AUC is undefined)."""
    import ray.data as rd

    part_schema = pa.schema([("score", pa.int64()), ("pos", pa.int64()),
                             ("neg", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        s_arr = t[score_col]
        if not pa.types.is_integer(s_arr.type):
            raise TypeError(
                f"roc_auc: score column {score_col!r} must be integer "
                f"(got {s_arr.type}) — cast to fixed-point upstream")
        s = s_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if y.size and (y.min() < 0 or y.max() > 1):
            raise ValueError("roc_auc: label column must be 0/1")
        uniq, inv = np.unique(s, return_inverse=True)
        pos = np.bincount(inv, weights=y, minlength=uniq.size)
        cnt = np.bincount(inv, minlength=uniq.size)
        return pa.table({"score": pa.array(uniq),
                         "pos": pa.array(pos.astype(np.int64)),
                         "neg": pa.array((cnt - pos).astype(np.int64))})

    agg = sorted_groupby_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["score"], [("pos", "sum", "pos"), ("neg", "sum", "neg")],
        in_schema=part_schema)

    # Ordered streaming sweep: sort-based groupby output blocks arrive
    # in global score order (the same cross-block contract scan.py's
    # running aggregates rely on).  Carry is two Python ints.
    cumneg = 0          # negatives at strictly smaller scores
    numer2 = 0          # 2 * (wins + half-ties), exact arbitrary-precision
    n_pos = 0
    n_neg = 0
    for t in agg.iter_batches(batch_format="pyarrow"):
        if t.num_rows == 0 or "score" not in t.column_names:
            continue
        p = t["pos"].to_numpy(zero_copy_only=False)
        g = t["neg"].to_numpy(zero_copy_only=False)
        cn = np.cumsum(g)                       # within-batch cum
        below = cn - g + cumneg                 # negatives strictly below
        if cn[-1] + cumneg < 2**31 and (p.max() if p.size else 0) < 2**31:
            numer2 += int(np.sum(p * (2 * below + g)))
        else:                                   # exact big-count fallback
            numer2 += sum(int(pi) * (2 * int(bi) + int(gi))
                          for pi, bi, gi in zip(p, below, g) if pi)
        cumneg += int(cn[-1])
        n_pos += int(p.sum())
        n_neg += int(g.sum())
    if n_pos == 0 or n_neg == 0:
        raise ValueError("roc_auc: need at least one positive and one "
                         "negative label — AUC is undefined")
    auc = float(numer2) / (2.0 * float(n_pos) * float(n_neg))
    return rd.from_arrow(pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "auc": pa.array([auc], pa.float64()),
    }))


def kl_by_group(ds, *, group_col: str, cat_col: str):
    """Per-group KL divergence of each group's categorical mix from
    the GLOBAL mix — the domain-composition monitor a corpus-curation
    pipeline runs per source (which sources deviate most from the
    overall language/type blend).

    With add-one Laplace smoothing over the global category set C
    (|C| distinct values observed anywhere):

      p_g(c) = (n_gc + 1) / (n_g + |C|)
      p(c)   = (n_c  + 1) / (n   + |C|)
      kl_g   = Σ_c p_g(c) · ln(p_g(c) / p(c))

    Every probability is an exact rational of int64 counts, so only
    the Σ over the (small, |C|-bounded) category set carries IEEE
    order drift — callers gate at 4 decimals.  Reuses the shared
    contingency plan: per-batch (group, cat, cnt) partials → ONE
    |G|·|C|-bounded grouped sum → contingency-bounded driver collect
    + a vectorized dense-grid finalize.  Returns one row per group
    (group, n, kl); raises on NULL categories (the contingency
    contract) and on empty input."""
    import ray.data as rd

    cells = _contingency_cells(ds, group_col, cat_col, "kl_by_group")
    if cells is None:
        raise ValueError("kl_by_group: empty input")
    ga = cells["a"].dictionary_encode().combine_chunks()
    cb = cells["b"].dictionary_encode().combine_chunks()
    gi = ga.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ci = cb.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = cells["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_groups = len(ga.dictionary)
    n_cats = len(cb.dictionary)
    grid = np.zeros((n_groups, n_cats), np.int64)
    grid[gi, ci] = cnt
    n_g = grid.sum(axis=1)                     # per-group totals
    n_c = grid.sum(axis=0)                     # global per-category
    n = int(n_c.sum())
    p_g = (grid + 1).astype(np.float64) / (n_g + n_cats)[:, None]
    p = (n_c + 1).astype(np.float64) / float(n + n_cats)
    kl = np.sum(p_g * np.log(p_g / p[None, :]), axis=1)
    order = np.argsort(
        ga.dictionary.to_numpy(zero_copy_only=False).astype(object))
    return rd.from_arrow(pa.table({
        "group": ga.dictionary.take(pa.array(order)),
        "n": pa.array(n_g[order]),
        "kl": pa.array(kl[order], pa.float64()),
    }))


def drift_stats_by_group(ds, *, group_col: str, value_col: str,
                         ts_col: str, split_us: int, lo_cents: int,
                         hi_cents: int, bins: int = 32):
    """Per-segment distribution drift — :func:`drift_stats` computed
    independently for every category of ``group_col`` (the
    per-feature-per-segment monitoring grid production ML runs).
    Identical bucket/smoothing/argmax contracts: exact int64 buckets,
    add-one-Laplace PSI rationals, integer-selected KS argmax.

    Exchanges: per-batch (group, bucket, period) bincount partials →
    ONE |G|·bins·2-bounded grouped sum → bounded collect + a
    vectorized dense-grid closed form.  Returns one row per group
    (group, n_a, n_b, psi, ks, ks_bucket); a group with an EMPTY
    period gets NULL psi/ks/ks_bucket (the SQL convention — unlike
    the global operator, which raises, a per-segment report must
    still list the segment).  Empty input raises."""
    import ray.data as rd

    if not (isinstance(bins, int) and bins >= 2):
        raise ValueError(f"bins must be an int >= 2, got {bins!r}")
    if not hi_cents > lo_cents:
        raise ValueError("hi_cents must exceed lo_cents")
    span = hi_cents - lo_cents

    part_schema = pa.schema([("g", pa.string()), ("bucket", pa.int64()),
                             ("period", pa.int64()), ("cnt", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        g = t[group_col]
        g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        if g.null_count:
            raise ValueError("drift_stats_by_group: NULL group")
        dg = g.dictionary_encode()
        gi = dg.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col]
        ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        us = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(v * 100).astype(np.int64)
        b = np.clip((cents - lo_cents) * bins // span, 0, bins - 1)
        per = (us >= split_us).astype(np.int64)
        code = (gi * bins + b) * 2 + per
        cnt = np.bincount(code, minlength=len(dg.dictionary) * bins * 2)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "g": dg.dictionary.take(pa.array(nz // (2 * bins))),
            "bucket": pa.array((nz // 2) % bins),
            "period": pa.array(nz % 2),
            "cnt": pa.array(cnt[nz].astype(np.int64))})

    agg = sorted_groupby_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["g", "bucket", "period"], [("cnt", "sum", "cnt")],
        in_schema=part_schema)

    tabs = [b for b in agg.iter_batches(batch_format="pyarrow")
            if b.num_rows and "g" in b.column_names]  # |G|·bins·2-bounded
    if not tabs:
        raise ValueError("drift_stats_by_group: empty input")
    cells = pa.concat_tables(tabs)
    dg = cells["g"].dictionary_encode().combine_chunks()
    gi = dg.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    bk = cells["bucket"].to_numpy(zero_copy_only=False)
    pr = cells["period"].to_numpy(zero_copy_only=False)
    cn = cells["cnt"].to_numpy(zero_copy_only=False)
    n_groups = len(dg.dictionary)
    na = np.zeros((n_groups, bins), np.int64)
    nb = np.zeros((n_groups, bins), np.int64)
    na[gi[pr == 0], bk[pr == 0]] = cn[pr == 0]
    nb[gi[pr == 1], bk[pr == 1]] = cn[pr == 1]
    n_a = na.sum(axis=1)
    n_b = nb.sum(axis=1)
    ok = (n_a > 0) & (n_b > 0)
    p = (na + 1).astype(np.float64) / np.maximum(n_a + bins, 1)[:, None]
    q = (nb + 1).astype(np.float64) / np.maximum(n_b + bins, 1)[:, None]
    psi = np.sum((p - q) * np.log(p / q), axis=1)
    ca = np.cumsum(na, axis=1)
    cb = np.cumsum(nb, axis=1)
    gap = np.abs(ca * n_b[:, None] - cb * n_a[:, None])
    k = np.argmax(gap, axis=1)                 # first max: smallest bucket
    ks = gap[np.arange(n_groups), k] / np.maximum(
        n_a.astype(np.float64) * n_b.astype(np.float64), 1.0)
    order = np.argsort(
        dg.dictionary.to_numpy(zero_copy_only=False).astype(object))
    null_mask = ~ok[order]                     # True → Arrow NULL
    return rd.from_arrow(pa.table({
        "group": dg.dictionary.take(pa.array(order)),
        "n_a": pa.array(n_a[order]),
        "n_b": pa.array(n_b[order]),
        "psi": pa.array(psi[order], pa.float64(), mask=null_mask),
        "ks": pa.array(ks[order], pa.float64(), mask=null_mask),
        "ks_bucket": pa.array(k[order].astype(np.int64),
                              pa.int64(), mask=null_mask),
    }))
