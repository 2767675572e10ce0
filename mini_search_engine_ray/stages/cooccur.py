"""Item co-occurrence association analytics — the "users who touched
X also touched Y" signal behind item-item collaborative filtering
(Sarwar et al. 2001; Linden et al. 2003, Amazon item-to-item CF) and
market-basket support/affinity mining.

Input is any (user, item) interaction Dataset.  The plan is entirely
the repo's bounded-exchange primitives:

1. distinct (user, item) pairs — one narrow range sort (repeat
   interactions collapse; binary incidence, the standard CF
   preprocessing);
2. per-item occurrence counts — item-keyed grouped count (node-scale);
3. the per-user pair explosion — ONE user-keyed sort-merge self-join,
   keeping each unordered pair once (item_a < item_b);
4. pair support — (item_a, item_b)-keyed grouped count;
5. two item-keyed joins attach the marginals, and the closing
   cosine / Jaccard expressions are each a couple of IEEE float64 ops
   so a SQL oracle replays the scores bit-exactly.

Scale shape: every exchange is keyed and output- or incidence-sized.
The self-join's intrinsic bound is sum(|items(u)|^2) over users —
the same quadratic-in-the-heaviest-row bound as every pairwise CF
formulation; ``max_user_items`` drops power users above a threshold
BEFORE the explosion (the standard practice: a user who touched
everything carries no discriminative signal and dominates the join),
and the cutoff is a plain count predicate so oracles replay it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .aggregates import sorted_groupby_agg
from .join import sort_merge_join

__all__ = ["cooccurrence_pairs"]


def cooccurrence_pairs(ds, user_col: str = "user_id",
                       item_col: str = "item", *, min_count: int = 1,
                       max_user_items: int | None = None,
                       partitions: int | None = None):
    """Unordered item pairs co-occurring in >= ``min_count`` users:
    rows ``(item_a, item_b, n_pair, n_a, n_b, cosine, jaccard)`` with
    ``item_a < item_b``; ``cosine = n_pair / sqrt(n_a·n_b)`` (the
    binary-incidence vector cosine) and ``jaccard = n_pair /
    (n_a + n_b − n_pair)``.  Null users/items drop.  ``n_a``/``n_b``
    count users of the item among the SURVIVING users when
    ``max_user_items`` prunes power users (the marginals and the
    pairs must come from the same incidence matrix or cosine > 1 is
    possible)."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if max_user_items is not None and max_user_items < 2:
        raise ValueError("max_user_items below 2 leaves no pairs")

    def proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u, it = t[user_col], t[item_col]
        keep = pc.and_kleene(pc.is_valid(u), pc.is_valid(it))
        out = pa.table({user_col: pc.cast(u, pa.int64()),
                        item_col: pc.cast(it, pa.int64())})
        return out.filter(pc.fill_null(keep, False))

    ui_schema = pa.schema([(user_col, pa.int64()), (item_col, pa.int64())])
    ui = sorted_groupby_agg(
        ds.map_batches(proj, batch_format="pyarrow"),
        [user_col, item_col], [(user_col, "count", "_m")],
        in_schema=ui_schema)
    ui = ui.map_batches(lambda t: t.drop_columns(["_m"]),
                        batch_format="pyarrow")

    if max_user_items is not None:
        per_user = sorted_groupby_agg(ui, [user_col],
                                      [(user_col, "count", "_deg")],
                                      in_schema=ui_schema)
        cap = max_user_items

        def under_cap(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(
                pc.less_equal(t["_deg"], cap)).drop_columns(["_deg"])

        keep_users = per_user.map_batches(under_cap, batch_format="pyarrow")
        ui = sort_merge_join(
            ui, keep_users, on=user_col, how="semi",
            left_schema=ui_schema,
            right_schema=pa.schema([(user_col, pa.int64())]),
            partitions=partitions)

    # ui feeds three consumers (marginals + both self-join sides);
    # it is incidence-sized — pin it as object-store blocks rather
    # than re-running the distinct (and the cap prune) per consumer.
    ui = ui.materialize()

    marg = sorted_groupby_agg(ui, [item_col], [(item_col, "count", "n")],
                              in_schema=ui_schema).materialize()

    joined = sort_merge_join(ui, ui, on=user_col, left_schema=ui_schema,
                             right_schema=ui_schema, partitions=partitions)
    item_r = item_col + "_r"

    def ordered(t: pa.Table) -> pa.Table:
        a = t[item_col].to_numpy(zero_copy_only=False)
        b = t[item_r].to_numpy(zero_copy_only=False)
        keep = a < b
        return pa.table({"item_a": pa.array(a[keep]),
                         "item_b": pa.array(b[keep])})

    support = sorted_groupby_agg(
        joined.map_batches(ordered, batch_format="pyarrow"),
        ["item_a", "item_b"], [("item_a", "count", "n_pair")],
        in_schema=pa.schema([("item_a", pa.int64()),
                             ("item_b", pa.int64())]))
    if min_count > 1:
        mc = min_count

        def sup_filter(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.greater_equal(t["n_pair"], mc))

        support = support.map_batches(sup_filter, batch_format="pyarrow")

    sup_schema = pa.schema([("item_a", pa.int64()), ("item_b", pa.int64()),
                            ("n_pair", pa.int64())])
    marg_schema = pa.schema([(item_col, pa.int64()), ("n", pa.int64())])
    with_a = sort_merge_join(support, marg, on="item_a",
                             right_on=item_col, suffix="_a",
                             left_schema=sup_schema,
                             right_schema=marg_schema,
                             partitions=partitions)
    wa_schema = pa.schema(list(sup_schema) + [pa.field("n", pa.int64())])
    with_b = sort_merge_join(with_a, marg, on="item_b",
                             right_on=item_col, suffix="_b",
                             left_schema=wa_schema,
                             right_schema=marg_schema,
                             partitions=partitions)

    def score(t: pa.Table) -> pa.Table:
        np_ = t["n_pair"].to_numpy(zero_copy_only=False)
        na = t["n"].to_numpy(zero_copy_only=False)
        nb = t["n_b"].to_numpy(zero_copy_only=False)
        cosine = np_ / np.sqrt((na * nb).astype(np.float64))
        jaccard = np_ / (na + nb - np_)
        return pa.table({
            "item_a": t["item_a"], "item_b": t["item_b"],
            "n_pair": t["n_pair"],
            "n_a": pa.array(na), "n_b": pa.array(nb),
            "cosine": pa.array(cosine), "jaccard": pa.array(jaccard),
        })

    return with_b.map_batches(score, batch_format="pyarrow")
