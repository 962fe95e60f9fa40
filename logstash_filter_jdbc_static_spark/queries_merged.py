"""Consolidated gate queries (round-3 verdict #1).

The grading driver's CORRECTNESS gate runs the FIRST 50 registry
entries (r1 ran 41/41, r2 46/46, r3 truncated at exactly 50), and the
registry had outgrown it. Per the verdict's instruction, overlapping
gated queries are consolidated so every distinct operator family fits
under the gate: each merged query below FULL-OUTER-joins the results
of its part queries on their natural key (round-4 verdict #6 — see
``_merge``), so the ORIGINAL operator plans run unchanged (every part
function still executes end-to-end — parse, enrich, dedup, ANN,
packing ...) and the oracle joins the SAME part oracle SQL texts. A
mismatch in any part still fails the merged row: nothing is gated more
weakly, there are simply fewer rows.

The part queries stay importable and unit-tested; ``CONSOLIDATED``
maps each part to the merged entry that now gates it, and
``queries.queries()``/``oracle_sql()`` exclude the parts from the
driver-facing registry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_filter_jdbc_static_spark import queries as Q
from logstash_filter_jdbc_static_spark.queries import register

# part -> merged gate entry (filled below; queries.py excludes keys)
CONSOLIDATED: dict[str, str] = {}


def _merge(name: str, keys: list[str], parts) -> None:
    """Register ``name`` as the FULL OUTER join of the part queries on
    ``keys`` (round-4 verdict #6). ``parts``: (part_name, [(src_col,
    out_col), ...]) — explicit projections, so colliding part columns
    get distinct names and redundant duplicates (same derivation in
    two parts) are dropped.

    Outer, not inner: an inner join could mask a part bug that
    adds/removes rows at keys its SIBLING parts don't cover (the bug's
    rows would vanish identically from both engines). The full outer
    join surfaces every key any part produced, NULL-padding the
    others, and a per-part boolean ``in_p{i}`` membership marker
    (FALSE on a miss, mirrored in the composed oracle SQL) pins each
    part's exact row membership into the hash compare."""
    # Eager capture: a merged query may reuse a part's name
    # (embeddings_kmeans, ann_ivf_multiprobe), so grab the part fn/SQL
    # BEFORE re-registering overwrites them.
    fns = [(Q.QUERIES[p], cols) for p, cols in parts]
    sqls = [Q.ORACLES[p] for p, _ in parts]
    n = len(parts)

    def fn(spark, sf_dir):
        out = None
        for i, (part_fn, cols) in enumerate(fns):
            df = part_fn(spark, sf_dir).select(
                *keys,
                *[F.col(s).alias(o) for s, o in cols],
                F.lit(True).alias(f"in_p{i}"),
            )
            # name-list join: Spark coalesces the key columns, exactly
            # like SQL USING
            out = df if out is None else out.join(df, keys, "full")
        sel = list(keys)
        for _, cols in fns:
            sel += [o for _, o in cols]
        return out.select(
            *sel,
            *[
                F.coalesce(F.col(f"in_p{i}"), F.lit(False)).alias(f"in_p{i}")
                for i in range(n)
            ],
        )

    fn.__name__ = name
    sel = [f"{k} AS {k}" for k in keys]  # USING-coalesced keys
    frm = f"FROM (SELECT q.*, TRUE AS __m0 FROM ({sqls[0]}) q) p0"
    for i, (_, cols) in enumerate(parts):
        sel += [f"p{i}.{s} AS {o}" for s, o in cols]
        if i:
            frm += (
                f"\nFULL JOIN (SELECT q.*, TRUE AS __m{i} "
                f"FROM ({sqls[i]}) q) p{i} USING ({', '.join(keys)})"
            )
    sel += [f"coalesce(p{i}.__m{i}, FALSE) AS in_p{i}" for i in range(n)]
    register(name, f"SELECT {', '.join(sel)}\n{frm}")(fn)
    for p, _ in parts:
        if p != name:
            CONSOLIDATED[p] = name


_merge(
    "lookup_like_shapes", ["conv_id", "turn_idx"],
    [
        ("lookup_like_prefix",
         [("ip_prefix", "ip_prefix"), ("server_name", "server_name")]),
        ("lookup_like_contains",
         [("octet", "octet"), ("n_servers", "n_servers"),
          ("names_str", "names_str")]),
    ],
)

_merge(
    "lookup_predicate_shapes", ["conv_id", "turn_idx"],
    [
        ("lookup_in_list",
         [("tool", "tool"), ("n_matches", "in_n"), ("hits_str", "in_hits")]),
        ("lookup_or_disjunction",
         [("from_ip", "from_ip"), ("octet", "or_octet"),
          ("n_matches", "or_n"), ("names_str", "or_names")]),
        ("lookup_between",
         [("lo_key", "lo_key"), ("n_matches", "btw_n"),
          ("names", "btw_names")]),
    ],
)

_merge(
    "lookup_result_shapes", ["conv_id", "turn_idx"],
    [
        ("lookup_order_limit",
         [("tool", "tool"), ("n_hosts", "n_hosts"),
          ("racks_str", "racks_str")]),
        ("lookup_distinct",
         [("ip_pat", "ip_pat"), ("n_tools", "n_tools"),
          ("tools_str", "tools_str")]),
    ],
)

_merge(
    "lookup_group_shapes", ["conv_id", "turn_idx"],
    [
        ("lookup_group_count",
         [("ip_pat", "ip_pat"), ("n_groups", "n_groups"),
          ("groups_str", "groups_str")]),
        # same ip_pat derivation as group_count: project it once
        ("lookup_group_having",
         [("n_groups", "having_n"), ("groups_str", "having_str")]),
        # round-5 late widening: an uncorrelated scalar subquery as a
        # HAVING comparand (resolved to one literal per snapshot)
        ("lookup_having_subquery",
         [("tool", "hs_tool"), ("n_hs", "hs_n"), ("hs_rows", "hs_rows")]),
        # round-5 latest widening: ORDER BY + LIMIT/OFFSET/FETCH over
        # the grouped payload (Derby's top-N-per-key single SELECT);
        # the *_rows strings are order-SENSITIVE
        ("lookup_grouped_tail",
         [("n_gt", "gt_n"), ("gt_rows", "gt_rows"),
          ("n_go", "go_n"), ("go_rows", "go_rows")]),
        # round-5 latest widening: CORRELATED scalar subqueries as
        # HAVING comparands (correlated column = GROUP BY key)
        ("lookup_corr_having",
         [("n_ch", "ch_n"), ("ch_rows", "ch_rows")]),
        # round-5 latest widening: correlated [NOT] IN and quantified
        # subqueries in HAVING (per-group set columns via hidden max
        # carriers; Derby-pinned)
        ("lookup_having_set",
         [("n_hi", "hi_n"), ("hi_rows", "hi_rows"),
          ("n_hq", "hq_n"), ("hq_rows", "hq_rows"),
          ("n_hp", "hp_n"), ("hp_rows", "hp_rows"),
          ("n_he", "he_n"), ("he_rows", "he_rows")]),
        # round-5 latest widening: [NOT] EXISTS in HAVING, correlated
        # on GROUP BY keys (group-constant flag via hidden max agg)
        ("lookup_having_exists",
         [("n_hx", "hx_n"), ("hx_rows", "hx_rows"),
          ("n_hnx", "hnx_n"), ("hnx_rows", "hnx_rows")]),
        # round-5 latest widening: projection scalar subqueries
        # combined with GROUP BY (the __psq column folds into the
        # grouping — group-constant by the corr-on-group-keys rule)
        ("lookup_psq_group",
         [("n_pg", "pg_n"), ("pg_rows", "pg_rows"),
          # round-5 latest: the GLOBAL-aggregate combination (hidden
          # max(__psq) aggregate; empty-set row carries the literal)
          ("mx_ga", "mx_ga"), ("n_ga", "n_ga"), ("s_ga", "s_ga"),
          # round-5 latest: PARAMETERIZED projection subquery (per-
          # event value overlaid into the payload post-stage)
          ("n_pp", "n_pp"), ("pp_rows", "pp_rows"),
          # round-5 latest: PARAMETERIZED scalar subquery as a HAVING
          # comparand (hidden overlaid carrier, read post-aggregation)
          ("n_ph", "n_ph"), ("ph_rows", "ph_rows")]),
    ],
)

_merge(
    "lookup_expr_shapes", ["conv_id", "turn_idx"],
    [
        ("lookup_arith",
         [("tool", "tool"), ("lim", "lim"), ("n_plans", "arith_n"),
          ("totals_str", "arith_totals")]),
        ("lookup_case_projection",
         [("n_plans", "case_n"), ("plans_str", "case_plans")]),
        # round-4 widening: static column/expression comparands and
        # uncorrelated scalar subqueries share this gate row
        ("lookup_col_rhs",
         [("n_plans", "rhs_n"), ("pairs_str", "rhs_pairs")]),
        ("lookup_subquery",
         [("n_hits", "subq_n"), ("prices_str", "subq_prices")]),
        ("lookup_union",
         [("n_tags", "union_n"), ("tags_str", "union_tags")]),
        ("lookup_corr_subquery",
         [("n_corr", "corr_n"), ("corr_prices", "corr_prices")]),
        ("lookup_in_subquery",
         [("n_in", "in_n"), ("in_prices", "in_prices")]),
        # round-5 widening: [NOT] EXISTS, correlated [NOT] IN, and
        # CAST/nullif/replace/instr share this gate row too
        ("lookup_exists",
         [("n_nx", "nx_n"), ("nx_prices", "nx_prices")]),
        ("lookup_corr_in",
         [("n_ci", "ci_n"), ("ci_prices", "ci_prices")]),
        # round-5 latest: INEQUALITY correlations in [NOT] IN /
        # quantified set subqueries (per-row sets via rid theta join)
        ("lookup_ineq_set",
         [("n_is", "is_n"), ("is_prices", "is_prices"),
          ("n_qs", "qs_n"), ("qs_prices", "qs_prices")]),
        ("lookup_cast_funcs",
         [("n_cf", "cf_n"), ("cf_rows", "cf_rows")]),
        ("lookup_exists_range",
         [("n_xr", "xr_n"), ("xr_prices", "xr_prices")]),
        ("lookup_join_expr",
         [("n_jx", "jx_n"), ("jx_rows", "jx_rows")]),
        # round-5 late widening: correlated subqueries in JOIN lookups
        # and literal ON operands (LEFT-join shape, not WHERE sugar)
        ("lookup_join_subquery",
         [("n_js", "js_n"), ("js_rows", "js_rows")]),
        ("lookup_join_onlit",
         [("n_ol", "ol_n"), ("ol_rows", "ol_rows")]),
        # round-5 late widening: scalar subqueries in the PROJECTION
        # (correlated per-group aggregate + uncorrelated typed literal)
        ("lookup_proj_subquery",
         [("n_ps", "ps_n"), ("ps_prices", "ps_prices"),
          ("ps_avg_sum", "ps_avg_sum"), ("ps_nplans", "ps_nplans")]),
        # round-5 late widening: UNION-level ORDER BY / FETCH FIRST
        ("lookup_union_order",
         [("n_uo", "uo_n"), ("uo_rows", "uo_rows")]),
        # round-5 late widening: Derby numeric built-ins
        # (sqrt/ln/atan2/degrees/sign)
        ("lookup_math_funcs",
         [("n_mf", "mf_n"), ("mf_rt_sum", "mf_rt_sum"),
          ("mf_ang_sum", "mf_ang_sum"), ("mf_sg_sum", "mf_sg_sum")]),
        # round-5 late widening: EXCEPT / INTERSECT set-op lookups
        ("lookup_setops",
         [("n_se", "se_n"), ("se_rows", "se_rows"),
          ("n_si", "si_n"), ("si_rows", "si_rows")]),
        # round-5 late widening: date/time extraction built-ins
        # (year/month/day/hour/minute/second)
        ("lookup_date_funcs",
         [("n_df", "df_n"), ("df_rows", "df_rows")]),
        # round-5 late widening: derived tables in FROM (incl. the
        # ordered top-N shape)
        ("lookup_derived",
         [("n_d1", "d1_n"), ("d1_rows", "d1_rows"),
          ("g_n", "dg_n"), ("g_mx", "dg_mx"),
          ("n_o", "do_n"), ("o_rows", "do_rows")]),
        # round-5 late widening: inequality-correlated scalar subqueries
        ("lookup_ineq_subquery",
         [("n_iq", "iq_n"), ("iq_rows", "iq_rows")]),
        # round-5 latest widening: aggregates / GROUP BY / HAVING /
        # DISTINCT inside UNION branches
        ("lookup_union_agg",
         [("n_ua", "ua_n"), ("ua_rows", "ua_rows")]),
        # round-5 latest widening: quantified subquery comparisons
        # (<op> ALL / ANY / SOME (SELECT ...), correlated and not)
        ("lookup_quantified",
         [("n_qf", "qf_n"), ("qf_rows", "qf_rows")]),
        # round-5 latest widening: parenthesized set-op branches with
        # their own ORDER BY/FETCH/OFFSET tails (order-sensitive rows)
        ("lookup_branch_tail",
         [("n_bt", "bt_n"), ("bt_rows", "bt_rows")]),
        # round-5 latest widening: expressions on both sides of a
        # correlation equality (upper(p2.plan) = upper(t.plan))
        ("lookup_expr_corr",
         [("n_xc", "xc_n"), ("xc_rows", "xc_rows")]),
        # round-5 latest widening: nested correlated scalar subqueries
        # (inner correlates to the enclosing subquery's relation)
        ("lookup_nested_corr",
         [("n_nc", "nc_n"), ("nc_rows", "nc_rows")]),
        # round-5 latest widening: SET subqueries nested inside
        # another subquery's WHERE (correlated IN + NOT EXISTS under
        # a top-level EXISTS) + nested INEQUALITY correlations (the
        # nested rid theta join)
        ("lookup_nested_set",
         [("n_ns", "ns_n"), ("ns_rows", "ns_rows"),
          ("n_ni", "ni_n"), ("ni_rows", "ni_rows")]),
        # round-5 latest widening: set ops INSIDE derived tables —
        # mixed joints under SQL precedence, EXCEPT/INTERSECT ALL
        # multisets, bare VALUES branch, trailing ordered top-N
        ("lookup_derived_setop",
         [("n_s1", "ds1_n"), ("s1_rows", "ds1_rows"),
          ("n_s2", "ds2_n"), ("s2_rows", "ds2_rows"),
          ("n_s3", "ds3_n"), ("s3_rows", "ds3_rows")]),
        # round-5 latest widening: the FULL set-op surface at the TOP
        # level too — mixed joints under SQL precedence, EXCEPT ALL /
        # INTERSECT ALL multisets (per-event HOF fold), parenthesized
        # groups with their own ordered top-N tails
        ("lookup_setops_all",
         [("n_xa", "xa_n"), ("xa_rows", "xa_rows"),
          ("n_gi", "gi_n"), ("gi_rows", "gi_rows")]),
        # round-5 latest widening: PARAMETERIZED subqueries — :param
        # equalities inside the sub-WHERE, compiled as per-event
        # aggregate frames broadcast-joined onto the fact
        ("lookup_param_subquery",
         [("n_ps", "psub_n"), ("ps_rows", "psub_rows"),
          ("n_pc", "pcnt_n"), ("pc_rows", "pcnt_rows")]),
        # round-5 latest widening: MIXED dim+param expressions on the
        # predicate rhs (cap > length(tkey) + :ti), incl. a mixed LIKE
        # pattern and a mixed IN item — compiled inside the theta probe
        ("lookup_mixed_expr",
         [("n_mx", "mx_n"), ("mx_rows", "mx_rows"),
          ("n_ml", "ml_n"), ("ml_rows", "ml_rows"),
          ("n_mi", "mi_n"), ("mi_rows", "mi_rows")]),
        # round-5 final widening: THETA-parameterized subqueries —
        # non-equality/OR/mixed param predicates in the sub-WHERE,
        # compiled as probe-time distinct-tuple aggregate frames
        # (scalar avg with OR, NOT IN value sets, EXISTS witness)
        ("lookup_theta_subquery",
         [("n_th", "th_n"), ("th_rows", "th_rows"),
          ("n_ts", "ts_n"), ("ts_rows", "ts_rows"),
          ("n_tx", "tx_n"), ("tx_rows", "tx_rows"),
          ("n_tp", "tp_n"), ("tp_rows", "tp_rows"),
          ("n_tg", "tg_n"), ("tg_rows", "tg_rows"),
          ("n_tm", "tm_n"), ("tm_rows", "tm_rows"),
          ("n_tn", "tn_n"), ("tn_rows", "tn_rows")]),
        # round-5 final widening: DISTINCT under every set function
        # (multiple per query — a documented superset of Derby's
        # one-DISTINCT-aggregate limit)
        ("lookup_distinct_aggs",
         [("da_sd", "da_sd"), ("da_ad", "da_ad"),
          ("da_cd", "da_cd")]),
    ],
)

_merge(
    "lookup_param_shapes", ["conv_id", "turn_idx"],
    [
        ("lookup_map_field_param", [("server_name", "server_name")]),
        ("lookup_int_ts_param", [("ts_hour", "ts_hour"), ("shift", "shift")]),
        # round-5 latest widening: expressions over params + literals
        # on the predicate rhs (equi key, arithmetic comparand,
        # computed LIKE pattern), compiled fact-side per event
        ("lookup_param_expr",
         [("n_pe", "pe_n"), ("pe_rows", "pe_rows"),
          ("n_pl", "pl_n"), ("pl_rows", "pl_rows")]),
    ],
)

_merge(
    "embeddings_kmeans", ["vec_id"],
    [
        ("embeddings_kmeans", [("centroid_id", "centroid_id")]),
        ("embeddings_kmeans_assign", [("centroid_id", "assigned_centroid")]),
    ],
)

_merge(
    "ann_ivf_multiprobe", ["query_id", "rank"],
    [
        ("ann_ivf_topk",
         [("neighbor_id", "sp_neighbor"), ("cos_sim", "sp_cos")]),
        ("ann_ivf_multiprobe",
         [("neighbor_id", "mp_neighbor"), ("cos_sim", "mp_cos")]),
        # >=10k-vector quantizer-scale variant (round-3 verdict #7):
        # same query_id 0..7 / rank 1..5 key domain by construction
        ("ann_ivf_scale10k",
         [("neighbor_id", "s10k_neighbor"), ("cos_sim", "s10k_cos")]),
    ],
)

_merge(
    "documents_text_hygiene", ["doc_id"],
    [
        ("documents_redact_pii",
         [("redacted", "redacted"), ("n_email", "n_email"),
          ("n_ipv4", "n_ipv4"), ("n_digits", "n_digits")]),
        ("documents_repetition_stats",
         [("n_lines", "n_lines"), ("dup_line_frac", "dup_line_frac"),
          ("top_token_share", "top_token_share")]),
    ],
)

_merge(
    "relational_window_topk", ["o_custkey", "o_orderkey"],
    [
        ("relational_topk_orders", [("total_price", "total_price")]),
        ("relational_window_running",
         [("order_seq", "order_seq"), ("running_spend", "running_spend")]),
    ],
)

_merge(
    "documents_sample_shuffle", ["doc_id"],
    [
        ("documents_stratified_sample", [("source", "source"), ("u", "u")]),
        ("documents_global_shuffle", [("shard", "shard"), ("pos", "pos")]),
    ],
)

_merge(
    "documents_content_scores", ["doc_id"],
    [
        ("documents_keywords", [("kw_str", "kw_str"), ("top_tf", "top_tf")]),
        ("documents_unigram_logprob",
         [("n_tokens", "n_tokens"), ("n_oov", "n_oov"),
          ("avg_logprob", "avg_logprob")]),
        ("documents_pack_sequences",
         [("n_tokens", "pack_n_tokens"), ("shard", "pack_shard"),
          ("pack_id", "pack_id")]),
    ],
)


_merge(
    "events_windowed_counts", ["window_start", "event_type"],
    [
        # batch twin + the REAL Structured Streaming run (readStream ->
        # window agg -> AvailableNow -> memory sink) share one gate row
        # (round-4 verdict #7); the full outer join + markers prove the
        # streaming sink's final contents equal the batch aggregation
        ("events_windowed_counts",
         [("n_events", "n_events"), ("sum_value", "sum_value")]),
        ("events_windowed_counts_stream",
         [("n_events", "st_n_events"), ("sum_value", "st_sum_value")]),
    ],
)


# dedup_simhash x ngram_jaccard_adjacent need a two-sided key map
# (simhash keyed by doc_id, jaccard by the adjacent pair), so this one
# is hand-joined instead of going through _merge.
_SIMHASH_FN = Q.QUERIES["dedup_simhash"]
_NGRAM_FN = Q.QUERIES["ngram_jaccard_adjacent"]
_SIMHASH_SQL = Q.ORACLES["dedup_simhash"]
_NGRAM_SQL = Q.ORACLES["ngram_jaccard_adjacent"]


@register(
    "dedup_simhash_jaccard",
    f"""
    SELECT j.id_a AS id_a, j.id_b AS id_b, j.jaccard AS jaccard,
           sa.simhash AS simhash_a, sb.simhash AS simhash_b
    FROM ({_NGRAM_SQL}) j
    JOIN ({_SIMHASH_SQL}) sa ON sa.doc_id = j.id_a
    JOIN ({_SIMHASH_SQL}) sb ON sb.doc_id = j.id_b
    """,
)
def dedup_simhash_jaccard(spark, sf_dir):
    j = _NGRAM_FN(spark, sf_dir)
    s = _SIMHASH_FN(spark, sf_dir)
    return (
        j.join(
            s.select(
                F.col("doc_id").alias("id_a"),
                F.col("simhash").alias("simhash_a"),
            ),
            "id_a",
        )
        .join(
            s.select(
                F.col("doc_id").alias("id_b"),
                F.col("simhash").alias("simhash_b"),
            ),
            "id_b",
        )
        .select("id_a", "id_b", "jaccard", "simhash_a", "simhash_b")
    )


CONSOLIDATED["dedup_simhash"] = "dedup_simhash_jaccard"
CONSOLIDATED["ngram_jaccard_adjacent"] = "dedup_simhash_jaccard"
