"""Driver-contract queries: one entry per implemented operator family
(SURVEY.md §2), each expressed through the engine API, with a matching
ANSI-SQL oracle for DuckDB.

Conventions that make the cross-engine value-hash comparison exact:
  * every computed column is aliased identically in the Spark plan and the
    oracle SQL;
  * double SUMs accumulate in DECIMAL (order-independent exact) and emit
    DOUBLE (aggregators.agg_sum_exact) — a plain double sum is
    partitioning-dependent;
  * row-level double arithmetic (x*(1-d) etc.) is IEEE-identical in both
    engines and is emitted raw;
  * libm-backed functions (exp/ln/sin/cos) are rounded to 6 decimals on both
    sides (last-ulp differences between JVM and C libm);
  * integer-ratio values (Jaccard, token ratios) are single IEEE divisions —
    exact, emitted raw;
  * set/list aggregations are sorted and joined to strings; event-ordered
    concats order by (ts, value).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .aggregators import agg_sum_exact
from .functions import dates as D
from .functions import maps as M
from .functions import math as X
from .functions import text as TX
from .llm import dedup, pii as PII, similarity, textqual
from .sources.joins import JoinedAggregateReader, JoinedReader
from .sources.similarity_join import edit_distance_self_join
from .sources.readers import (AggSpec, AggregateDataReader, ConditionalDataReader,
                              CutOffTime, DataReader, InlineReader,
                              aggregate_events, conditional_aggregate_events)
from .sources.tables import load_table

CUTOFF = "2024-01-15 00:00:00"

# domain_reweight gate config (corpus_mixture part='repeat'): shared between
# the Spark query and the oracle SQL so the two can never drift
RW_SHARES = {"en": 0.4, "fr": 0.3, "de": 0.3}
RW_SCALE = 1.0


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# scans / joins / aggregation readers
# ---------------------------------------------------------------------------

def q_scan_pushdown(spark, sf_dir):
    """Parquet scan with projection + filter pushdown (DataReader.generate —
    the select happens at the scan so parquet reads 4 of 11 columns).
    Since r5 the row also carries the Z-ORDER key (sources/layout.
    zorder_key over quantity x price, 21 bits each): range-scale to
    21-bit integers from the filtered frame's min/max, Morton
    bit-interleave — every floating-point step a single IEEE op the
    oracle replicates, so the clustering-key math itself is hash-gated."""
    from .sources.layout import zorder_key
    li = DataReader(path=f"{sf_dir}/lineitem.parquet", key_col="l_orderkey")
    df = li.read(spark)
    filtered = df.where(F.col("l_quantity") >= 45)
    zk = zorder_key(filtered, ["l_quantity", "l_extendedprice"])
    return filtered.select("l_orderkey", "l_linenumber", "l_quantity",
                           "l_extendedprice", zk.alias("zkey"))


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing rollup — the relational surface our DataFrame
    substrate gives for free (SURVEY.md §2.12)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_quantity") <= 49)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            agg_sum_exact(F.col("l_quantity")).alias("sum_qty"),
            agg_sum_exact(F.col("l_extendedprice")).alias("sum_base_price"),
            agg_sum_exact(disc_price).alias("sum_disc_price"),
            agg_sum_exact(charge).alias("sum_charge"),
            (agg_sum_exact(F.col("l_quantity")) / F.count(F.lit(1)).cast("double")).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_left_agg(spark, sf_dir):
    """Join-family carrier (merged r7 — the old join_inner_agg row's slot
    was freed for retrieval_indexed; its evidence lives on here).

    part='left': LeftOuter join + per-key monoid aggregation
    (JoinedAggregateDataReader) — one row per customer.
    part='inner': inner equi-join (JoinedReader, JoinTypes.Inner) +
    segment rollup, ROUTED THROUGH sources/joins.skew_join: three
    explicit hot keys take the broadcast branch, the rest sort-merge,
    and the union must be hash-identical to the plain inner join the
    oracle computes — gating the skew-routing machinery (key-set split,
    branch joins, exact union) with driver evidence."""
    jr = JoinedReader(left=DataReader(path=f"{sf_dir}/customer.parquet"),
                      right=DataReader(path=f"{sf_dir}/orders.parquet"),
                      left_key="c_custkey", right_key="o_custkey", join_type="left")
    ja = JoinedAggregateReader(
        joined=jr, key_col="c_custkey",
        specs=[
            AggSpec("n_orders", "case when o_orderkey is not null then 1 end", "sum"),
            AggSpec("total_spend", "o_totalprice", "sum_exact"),
            AggSpec("max_order", "o_totalprice", "max"),
        ])
    left = ja.generate(spark).select(
        F.lit("left").alias("part"), "key", "n_orders", "total_spend",
        "max_order")
    from .sources.joins import skew_join
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders") \
        .withColumnRenamed("o_custkey", "c_custkey")
    joined = skew_join(cust, orders, "c_custkey", how="inner",
                       hot=[{"c_custkey": k} for k in (1, 7, 42)])
    inner = (joined
             .groupBy("c_mktsegment")
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  agg_sum_exact(F.col("o_totalprice")).alias("total_spend"),
                  F.max("o_totalprice").alias("max_order"))
             .select(F.lit("inner").alias("part"),
                     F.col("c_mktsegment").alias("key"),
                     "n_orders", "total_spend", "max_order"))
    return left.unionByName(inner)


def q_join_outer_combined(spark, sf_dir):
    """FullOuter join with combined-key coalesce (combineKeysUDF ->
    F.coalesce) + rollup."""
    jr = JoinedReader(left=DataReader(path=f"{sf_dir}/nation.parquet"),
                      right=DataReader(path=f"{sf_dir}/supplier.parquet"),
                      left_key="n_nationkey", right_key="s_nationkey",
                      join_type="outer", combine_keys_as="nationkey")
    df = jr.generate(spark)
    return (df.groupBy(F.col("nationkey").cast("long").alias("nationkey"))
            .agg(F.max("n_name").alias("n_name"),
                 F.sum(F.when(F.col("s_suppkey").isNotNull(), 1)).alias("n_suppliers"),
                 agg_sum_exact(F.col("s_acctbal")).alias("total_bal")))


def q_multiway_broadcast(spark, sf_dir):
    """Left-deep 4-way join tree (JoinedDataReader leftReader recursion) with
    broadcast dims — revenue per region. region/nation are broadcast
    (dimension tables stay small at any scale factor); the customer⋈orders
    shuffle is the only exchange of fact-sized data."""
    j1 = JoinedReader(left=DataReader(path=f"{sf_dir}/nation.parquet"),
                      right=DataReader(path=f"{sf_dir}/region.parquet"),
                      left_key="n_regionkey", right_key="r_regionkey",
                      join_type="inner", broadcast_right=True)
    j2 = JoinedReader(left=JoinedReader(
        left=DataReader(path=f"{sf_dir}/customer.parquet"),
        right=DataReader(path=f"{sf_dir}/orders.parquet"),
        left_key="c_custkey", right_key="o_custkey", join_type="inner"),
        right=DataReader(path=f"{sf_dir}/nation.parquet"),
        left_key="c_nationkey", right_key="n_nationkey",
        join_type="inner", broadcast_right=True)
    nr = j1.generate(spark).select(F.col("n_nationkey").alias("nk"), "r_name")
    df = j2.generate(spark).join(F.broadcast(nr), F.col("c_nationkey") == F.col("nk"), "inner")
    return (df.groupBy("r_name")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 agg_sum_exact(F.col("o_totalprice")).alias("revenue")))


# ---------------------------------------------------------------------------
# event aggregation readers (the reference's GROUP BY)
# ---------------------------------------------------------------------------

def q_agg_reader_cutoff_base(spark, sf_dir):
    """AggregateDataReader: predictors over t < cutoff, responses over
    t >= cutoff, per-type monoids. (Bench-measured base form — the
    registry row ``agg_reader_cutoff`` joins the ConditionalDataReader
    columns onto this, see q_agg_reader_cutoff.)"""
    ev = InlineReader(_t(spark, sf_dir, "events"))
    r = AggregateDataReader(
        reader=ev, key_col="user_id", time_col="ts",
        cutoff=CutOffTime(timestamp=CUTOFF),
        specs=[
            AggSpec("total_value", "value", "sum_exact"),
            AggSpec("n_events", "1", "sum"),
            AggSpec("n_purchases", "case when event_type='purchase' then 1 end", "sum"),
            AggSpec("max_value", "value", "max"),
            AggSpec("types_seen", "event_type", "set_union"),
            AggSpec("error_after", "event_type='error'", "logical_or", is_response=True),
        ])
    df = r.generate(spark)
    return df.withColumn("types_seen", F.array_join(F.col("types_seen"), ","))


def q_agg_first_last(spark, sf_dir):
    """First/Last event aggregators (TimeBasedAggregator.scala:61-225) PLUS
    the concat (event-time order), deterministic mode, and logical
    or/and/xor monoids (Text.scala:56-69, ExtendedMultiset mode,
    Numerics.scala:118-120) — formerly the separate agg_concat_mode_logical
    registry row, merged here (one aggregate_events pass, same per-key
    shuffle) to free a slot inside the driver's 50-row correctness window
    for the round-4 surfaces."""
    ev = _t(spark, sf_dir, "events")
    specs = [
        AggSpec("first_type", "event_type", "first"),
        AggSpec("last_type", "event_type", "last"),
        AggSpec("first_value", "value", "first"),
        AggSpec("last_value", "value", "last"),
        AggSpec("min_ts_ms", "ts_ms", "min"),
        AggSpec("max_ts_ms", "ts_ms", "max"),
        AggSpec("type_concat", "event_type", "concat"),
        AggSpec("type_mode", "event_type", "mode"),
        AggSpec("any_high", "value > 90", "logical_or"),
        AggSpec("all_positive", "value > 0", "logical_and"),
        AggSpec("odd_purchases", "event_type = 'purchase'", "logical_xor"),
    ]
    return aggregate_events(ev, "user_id", "ts", CutOffTime(), specs)


def q_conditional_reader(spark, sf_dir):
    """ConditionalDataReader: per-key cutoff = time of first 'purchase';
    keys without the condition dropped; predictors aggregated before it."""
    ev = _t(spark, sf_dir, "events")
    specs = [
        AggSpec("pre_value", "value", "sum_exact"),
        AggSpec("pre_events", "1", "sum"),
        AggSpec("pre_types", "event_type", "set_union"),
    ]
    df = conditional_aggregate_events(ev, "user_id", "ts", "event_type = 'purchase'",
                                      specs, timestamp_to_keep="min")
    return df.withColumn("pre_types", F.array_join(F.coalesce(
        F.col("pre_types"), F.array().cast("array<string>")), ","))


def q_agg_reader_cutoff(spark, sf_dir):
    """Registry row carrying BOTH cutoff readers (r9: the registry grew to
    52 keys while the driver gates only the FIRST 50 — r8 silently lost
    loco_insights/model_selection rows; merging the two event-reader
    queries frees a slot without losing either hash gate):

    * the AggregateDataReader columns (q_agg_reader_cutoff_base), and
    * the ConditionalDataReader columns (q_conditional_reader,
      pre_value/pre_events/pre_types) LEFT-joined on key — keys whose
      condition never fired carry NULLs (the standalone conditional
      reader DROPS those keys; the join preserves that semantic as
      null-vs-present, which the oracle replicates).

    Both readers aggregate the same events table on the same key, so the
    join is a cheap post-aggregation merge (two 150-row frames at gate
    scale), not a new shuffle shape."""
    a = q_agg_reader_cutoff_base(spark, sf_dir)
    b = q_conditional_reader(spark, sf_dir)
    return a.join(b, "key", "left")


def q_map_monoid(spark, sf_dir):
    """Map monoid (Union*Map, aggregators/Maps.scala): parse JSON props to a
    map, key-wise sum per user, emitted relationally (key, map_key, total).
    Also carries the RealMapVectorizer fitted per-key mean-fill + null slot
    (part='vectorizer' rows, per event) — formerly the separate
    map_vectorizer registry row, merged to free a 50-row-window slot."""
    from .aggregators import aggregate_map_column
    ev = _t(spark, sf_dir, "events").withColumn(
        "props_map", M.parse_json_map(F.col("props"), "bigint"))
    agg = aggregate_map_column(ev, "user_id", "props_map", "m", "sum")
    monoid = (agg.select(F.col("user_id").cast("string").alias("key"),
                         F.explode(F.col("m")).alias("map_key", "total"))
              .select(F.lit("monoid").alias("part"), "key", "map_key",
                      "total", F.lit(None).cast("double").alias("k_value"),
                      F.lit(None).cast("double").alias("k_null")))
    vec = q_map_vectorizer(spark, sf_dir).select(
        F.lit("vectorizer").alias("part"),
        F.col("event_id").cast("string").alias("key"),
        F.lit("k").alias("map_key"),
        F.lit(None).cast("long").alias("total"),
        "k_value", "k_null")
    return monoid.union(vec)


# ---------------------------------------------------------------------------
# row-level operators: filters / math / text / dates
# ---------------------------------------------------------------------------

def q_filter_math_ops(spark, sf_dir):
    """FilterTransformer / ReplaceTransformer / ExistsTransformer /
    ToOccurTransformer + the MathTransformers (null-safe arithmetic with
    NaN/Inf->NULL guards) as one fused per-row projection — merged so every
    registry entry fits the driver's 50-query correctness window."""
    li = _t(spark, sf_dir, "lineitem")
    qty, flag = F.col("l_quantity"), F.col("l_returnflag")
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return li.select(
        "l_orderkey", "l_linenumber",
        # filter / replace / exists / occur (§2.5)
        F.when(qty > 25, qty).otherwise(F.lit(None)).alias("qty_filtered"),
        F.when(flag.eqNullSafe("N"), F.lit("NONE")).otherwise(flag).alias("flag_replaced"),
        F.coalesce(flag.isin("A", "R"), F.lit(False)).alias("is_returned"),
        F.when(F.col("l_tax").isNotNull() & (F.col("l_tax") > 0), 1.0).otherwise(0.0).alias("tax_occurs"),
        # math transformers (§2.6)
        X.multiply(price, (1 - disc) * (1 + tax)).alias("charge"),
        X.divide(price, qty).alias("unit_price"),
        X.ceil(price).alias("price_ceil"),
        X.floor(price).alias("price_floor"),
        X.round_digits(price, 1).alias("price_round1"),
        X.sqrt(qty).alias("qty_sqrt"),
        F.round(X.log(price), 6).alias("price_ln6"),
        F.round(X.exp(disc), 6).alias("disc_exp6"),
        X.power(qty, 2.0).alias("qty_sq"),
        X.absolute(disc - F.lit(0.05)).alias("disc_dev"),
    )


def q_text_ops(spark, sf_dir):
    """Tokenizer / text length / substring / email parse-and-validate
    (TextTokenizer, SubstringTransformer, RichTextFeature email DSL) + phone
    validation/normalization (PhoneNumberParser surface) — one per-customer
    projection (merged so every registry entry fits the 50-query window).

    ph_* / intl_* (r9): the FULL parse_phone path finally hash-gated
    (previously only the NANP fast path was): the national arm runs the
    e164 struct WITH the r8/r9 sub-range + full-regex tiers
    (ranges=/patterns= — the libphonenumber data tiers as injected
    rules), the intl arm cycles +1/+44/+49 inputs of varying national
    length through the longest-cc map probe, per-region length/lead
    metadata, and the NANP 4th-digit rule. The oracle replicates every
    check from the SAME _REGION_META rows (generated SQL — one source
    of truth)."""
    cust = _t(spark, sf_dir, "customer")
    name = F.col("c_name")
    email = F.concat(F.regexp_replace(F.lower(name), r"[^a-z0-9]", ""), F.lit("@example.com"))
    digits = F.lpad((F.col("c_custkey") * 7919 % 10000000000).cast("string"), 10, "2")
    phone = F.concat(F.lit("("), F.substring(digits, 1, 3), F.lit(") "),
                     F.substring(digits, 4, 3), F.lit("-"), F.substring(digits, 7, 4))
    # PII surface (llm/pii.py) on a synthetic per-customer note: email present
    # on 2/3 of rows, a custkey-derived private IP, and a credit card that is
    # Luhn-valid exactly on even keys — so the detect counts (checksum gate
    # included) and the email/ip redaction are value-verified by the oracle.
    email_part = F.when(F.col("c_custkey") % 3 == 0, F.lit("none")) \
        .otherwise(email)
    ip = F.concat(F.lit("10."), (F.col("c_custkey") % 256).cast("string"),
                  F.lit(".0.1"))
    card = F.when(F.col("c_custkey") % 2 == 0,
                  F.lit("4532015112830366")).otherwise(F.lit("4532015112830367"))
    note = F.concat(F.lit("contact "), email_part, F.lit(" from "), ip,
                    F.lit(" card "), card)
    pii_counts = PII.detect_pii(note, ["email", "ipv4", "credit_card"])
    p_nat = TX.parse_phone(phone, "US",
                           ranges={"US": [("2", 10, 10)]},
                           patterns={"US": [r"[2-8]\d{9}"]})
    intl_raw = F.concat(
        F.element_at(F.array(F.lit("+1"), F.lit("+44"), F.lit("+49")),
                     (F.col("c_custkey") % 3 + 1).cast("int")),
        digits.substr(F.lit(1), (F.col("c_custkey") % 8 + 4).cast("int")))
    p_intl = TX.parse_phone(intl_raw, "US")
    return cust.select(
        "c_custkey",
        F.size(TX.tokenize(name)).cast("long").alias("n_tokens"),
        TX.text_len(name).alias("name_len"),
        TX.is_substring(F.lit("customer"), name).alias("has_customer"),
        email.alias("email"),
        TX.is_valid_email(email).alias("email_valid"),
        TX.email_prefix(email).alias("email_prefix"),
        TX.email_domain(email).alias("email_domain"),
        F.array_join(TX.tokenize(name), "|").alias("tokens_joined"),
        phone.alias("phone"),
        TX.normalize_phone_digits(phone).alias("phone_digits"),
        TX.is_valid_phone_us(phone).alias("phone_valid"),
        p_nat["e164"].alias("ph_e164"),
        F.coalesce(p_nat["valid"], F.lit(False)).alias("ph_sub_valid"),
        p_intl["region"].alias("intl_region"),
        F.coalesce(p_intl["valid"], F.lit(False)).alias("intl_valid"),
        p_intl["e164"].alias("intl_e164"),
        note.alias("pii_note"),
        F.element_at(pii_counts, "email").alias("pii_emails"),
        F.element_at(pii_counts, "ipv4").alias("pii_ipv4"),
        F.element_at(pii_counts, "credit_card").alias("pii_cards"),
        PII.redact_pii(note, ["email", "ipv4"]).alias("note_redacted"),
    )


def q_date_ops(spark, sf_dir):
    """TimePeriodTransformer calendar units + DateToUnitCircle projection."""
    o = _t(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    sin_doy, cos_doy = D.unit_circle(ts, "DayOfYear")
    return o.select(
        "o_orderkey",
        D.time_period(ts, "DayOfMonth").alias("day_of_month"),
        D.time_period(ts, "DayOfWeek").alias("day_of_week"),
        D.time_period(ts, "DayOfYear").alias("day_of_year"),
        D.time_period(ts, "MonthOfYear").alias("month_of_year"),
        D.time_period(ts, "WeekOfYear").alias("week_of_year"),
        F.unix_millis(F.date_trunc("month", ts)).alias("month_start_ms"),
        # + 0.0 canonicalizes IEEE -0.0 so Spark and the DuckDB oracle hash alike
        (F.round(sin_doy, 6) + F.lit(0.0)).alias("doy_sin6"),
        (F.round(cos_doy, 6) + F.lit(0.0)).alias("doy_cos6"),
    )


def q_text_similarity(spark, sf_dir):
    """JaccardSimilarity over token sets of adjacent document pairs."""
    docs = _t(spark, sf_dir, "documents")
    d1 = docs.select(F.col("doc_id").alias("id1"), F.col("text").alias("t1"))
    d2 = docs.select((F.col("doc_id") - 1).alias("id1"), F.col("doc_id").alias("id2"),
                     F.col("text").alias("t2"))
    pairs = d1.join(d2, "id1", "inner")
    tok1, tok2 = TX.tokenize(F.col("t1")), TX.tokenize(F.col("t2"))
    return pairs.select(
        "id1", "id2",
        TX.jaccard_similarity(tok1, tok2).alias("token_jaccard"),
    )


def q_bin_score_calibration(spark, sf_dir):
    """OpBinScoreEvaluator: per-decile calibration table (decimal-exact
    averages)."""
    o = _t(spark, sf_dir, "orders")
    s = F.col("o_totalprice") / F.lit(600000.0)
    y = (F.col("o_orderstatus") == "F").cast("double")
    b = F.least(F.floor(s * 10).cast("long"), F.lit(9))
    return (o.groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum(s.cast("decimal(30,12)")).cast("double") / F.count(F.lit(1))).alias("avg_score"),
                 (F.sum(y.cast("decimal(30,12)")).cast("double") / F.count(F.lit(1))).alias("rate")))


def q_set_ops(spark, sf_dir):
    """Relational set operators (SURVEY §2.12 — free from the DataFrame
    substrate): customers with orders INTERSECT/EXCEPT customers with
    events. Also carries ORDER BY + LIMIT with a deterministic tie-break
    as the ``top_order`` rows — formerly the separate sort_limit registry
    row, merged to free a 50-row-window slot (TopK in Spark is a
    TakeOrderedAndProject, no global sort)."""
    cust_o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")).distinct()
    cust_e = _t(spark, sf_dir, "events").select(F.col("user_id").alias("k")).distinct()
    both = cust_o.intersect(cust_e).withColumn("set_op", F.lit("both"))
    only_orders = cust_o.exceptAll(cust_e).withColumn("set_op", F.lit("orders_only"))
    sets = both.union(only_orders) \
        .select(F.col("k").cast("long").alias("k"), "set_op",
                F.lit(None).cast("double").alias("val"))
    o = _t(spark, sf_dir, "orders")
    top = (o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
           .limit(20)
           .select(F.col("o_orderkey").cast("long").alias("k"),
                   F.lit("top_order").alias("set_op"),
                   F.col("o_totalprice").cast("double").alias("val")))
    return sets.union(top)


def q_spearman(spark, sf_dir):
    """Spearman rank correlation (SanityChecker corrType=spearman) between
    order price and a derived noisy signal — exact integer rank arithmetic."""
    o = _t(spark, sf_dir, "orders")
    df = o.select(F.col("o_totalprice").alias("x"),
                  (F.col("o_totalprice") % 1000).alias("y"))
    from .util import counts_below

    def ranked(col):
        # 2*avg_rank per distinct value; "below" comes from range-partitioned
        # parallel windows (util.counts_below) — no single-partition global
        # ordering, so the plan survives continuous (all-distinct) inputs
        g = (df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
             .groupBy("v").agg(F.count(F.lit(1)).alias("n")))
        g = counts_below(g, "v", "n")
        return g.select(F.col("v").alias(col), (2 * F.col("below") + F.col("n") + 1).alias(f"_r_{col}"))

    j = df.join(ranked("x"), "x").join(ranked("y"), "y")
    agg = j.agg(F.count(F.lit(1)).alias("n"),
                F.sum("_r_x").alias("sx"), F.sum("_r_y").alias("sy"),
                F.sum(F.col("_r_x") * F.col("_r_y")).alias("sxy"),
                F.sum(F.col("_r_x") * F.col("_r_x")).alias("sxx"),
                F.sum(F.col("_r_y") * F.col("_r_y")).alias("syy"))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    # each variance factor fits in int64 exactly; their PRODUCT does not -
    # convert to double first (deterministic nearest-even, same in DuckDB)
    fx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    fy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    den = F.sqrt(fx * fy)
    return agg.select(F.col("n").alias("n_rows"),
                      F.round(num.cast("double") / den, 6).alias("spearman6"))


def q_correlation_stats(spark, sf_dir):
    """SanityChecker's two association measures in one row: Spearman rank
    correlation (numeric) + Cramér's V (categorical) — both exact integer
    numerators, one rounded double each (merged 1-row frames so every
    registry entry fits the 50-query window)."""
    return q_spearman(spark, sf_dir).crossJoin(q_cramers_v(spark, sf_dir))


def q_joined_secondary_agg(spark, sf_dir):
    """JoinedAggregateReader withSecondaryAggregation (TimeBasedFilter):
    customer x events join, then cutoff-windowed per-key aggregation."""
    from .sources.joins import TimeBasedFilter
    cust = DataReader(path=f"{sf_dir}/customer.parquet")
    ev = _t(spark, sf_dir, "events")
    joined = cust.read(spark).join(ev, F.col("c_custkey") == F.col("user_id"), "inner")
    specs = [AggSpec("pre_value", "value", "sum_exact"),
             AggSpec("pre_events", "1", "sum"),
             AggSpec("bal", "c_acctbal", "max")]
    return aggregate_events(joined, "c_custkey", "ts",
                            CutOffTime(timestamp=CUTOFF), specs)


def q_cramers_v(spark, sf_dir):
    """Chi² / Cramér's V between segment and order status (the
    SanityChecker's categorical association check, OpStatistics parity).
    Integer contingency cells; one rounded double out."""
    from .operators.preparators import contingency_counts
    jr = JoinedReader(left=DataReader(path=f"{sf_dir}/customer.parquet"),
                      right=DataReader(path=f"{sf_dir}/orders.parquet"),
                      left_key="c_custkey", right_key="o_custkey", join_type="inner")
    df = jr.generate(spark)
    cells = contingency_counts(df, "c_mktsegment", "o_orderstatus")
    rt = cells.groupBy("c_mktsegment").agg(F.sum("n").alias("rt"))
    ct = cells.groupBy("o_orderstatus").agg(F.sum("n").alias("ct"))
    tot = cells.agg(F.sum("n").alias("NT"),
                    F.countDistinct("c_mktsegment").alias("NR"),
                    F.countDistinct("o_orderstatus").alias("NC"))
    joined = cells.join(rt, "c_mktsegment").join(ct, "o_orderstatus").crossJoin(tot)
    chi2 = joined.agg(
        F.sum((F.col("n") * F.col("n")).cast("double")
              / (F.col("rt") * F.col("ct")).cast("double")).alias("s"),
        F.first("NT").alias("NT"), F.first("NR").alias("NR"), F.first("NC").alias("NC"))
    return chi2.select(
        F.col("NT").alias("n_pairs"),
        F.round(F.sqrt((F.col("NT") * (F.col("s") - 1)).cast("double")
                       / (F.col("NT") * F.least(F.col("NR") - 1, F.col("NC") - 1)).cast("double")),
                6).alias("cramers_v6"))


def q_onehot_topk(spark, sf_dir):
    """OpSetVectorizer TopK pivot semantics, exposed relationally: each row's
    category mapped to its fitted bucket (top-K by support, else OTHER).
    Also carries OpStringIndexer (deterministic label indexing, freq desc /
    value asc, null -> keep bucket) as the ``seg_idx`` column — formerly the
    separate string_indexer registry row, merged to free a 50-row-window
    slot; both estimators fit over the same customer scan."""
    from .feature import from_dataframe
    from .operators.categorical import string_indexer
    from .operators.vectorizers import one_hot_estimator
    cust = _t(spark, sf_dir, "customer")
    feats = from_dataframe(cust, overrides={"c_mktsegment": "PickList"})
    est = one_hot_estimator(feats["c_mktsegment"], top_k=3, min_support=10)
    fitted = est.fit(cust)
    values = [s.indicator_value for s in fitted.slots
              if s.indicator_value not in ("OTHER", "NullIndicatorValue")]
    bucket = F.lit("OTHER")
    for v in values:
        bucket = F.when(F.col("c_mktsegment").eqNullSafe(F.lit(v)), F.lit(v)).otherwise(bucket)
    indexer = string_indexer(feats["c_mktsegment"], handle_invalid="keep").fit(cust)
    return cust.select("c_custkey", bucket.alias("bucket"),
                       indexer.expr().alias("seg_idx"))


def q_numeric_fitted(spark, sf_dir):
    """Fitted numeric estimators: standard scaler (decimal-exact moments),
    mean imputation, explicit-split bucketizer, percentile calibrator."""
    import math as _m
    from .feature import from_dataframe
    from .operators.numeric import (fill_missing_with_mean, numeric_bucketizer,
                                    percentile_calibrator, standard_scaler)
    o = _t(spark, sf_dir, "orders")
    feats = from_dataframe(o, overrides={"o_totalprice": "Currency"})
    price = feats["o_totalprice"]
    scaled = standard_scaler(price, output_name="price_scaled").fit(o)
    imputed = fill_missing_with_mean(price, output_name="price_imputed").fit(o)
    bucket = numeric_bucketizer(price, [-_m.inf, 100000.0, 200000.0, 300000.0, _m.inf],
                                output_name="price_bucket")
    decile = percentile_calibrator(price, buckets=10, output_name="price_decile").fit(o)
    return o.select("o_orderkey", F.round(scaled.expr(), 6).alias("price_scaled"),
                    imputed.expr(), bucket.expr(), decile.expr())


def q_auroc_eval(spark, sf_dir):
    """OpBinaryClassificationEvaluator AuROC — exact integer Mann-Whitney."""
    from .ml.evaluators import auroc_frame
    o = _t(spark, sf_dir, "orders")
    scored = o.select(F.col("o_totalprice").alias("score"),
                      (F.col("o_orderstatus") == "F").cast("double").alias("label"))
    return auroc_frame(scored, "score", "label")


def q_binary_eval(spark, sf_dir):
    """Binary + multiclass evaluators in one row: threshold confusion
    metrics, exact integer Mann-Whitney AuROC, and
    OpMultiClassificationEvaluator top-N correctness / macro P-R-F1 over a
    deterministic 3-class problem (orderstatus; per-class scores are exact
    integer arithmetic so the rank comparisons are reproducible in SQL).
    Merged so every registry entry fits the 50-query window."""
    from .ml.evaluators import multiclass_metrics_frame
    o = _t(spark, sf_dir, "orders")
    s = F.col("o_totalprice") / F.lit(1000000.0)
    y = (F.col("o_orderstatus") == "F").cast("double")
    pred = (s >= 0.15).cast("long")
    confusion = o.agg(
        F.sum(((pred == 1) & (y == 1)).cast("long")).alias("tp"),
        F.sum(((pred == 1) & (y == 0)).cast("long")).alias("fp"),
        F.sum(((pred == 0) & (y == 1)).cast("long")).alias("fn"),
        F.sum(((pred == 0) & (y == 0)).cast("long")).alias("tn"),
    )
    # 3-class eval: label = orderstatus index; "probabilities" are
    # deterministic integer-derived scores (rank order is what matters)
    k = F.col("o_orderkey")
    mc = o.select(
        F.when(F.col("o_orderstatus") == "F", 0.0)
        .when(F.col("o_orderstatus") == "O", 1.0).otherwise(2.0).alias("my"),
        F.array((k * 7 % 100).cast("double") / 100.0,
                ((k * 13 + 3) % 100).cast("double") / 100.0,
                ((k * 29 + 7) % 100).cast("double") / 100.0).alias("probs"))
    p0, p1, p2 = (F.col("probs")[i] for i in range(3))
    mc = mc.withColumn(
        "mpred", F.when((p0 >= p1) & (p0 >= p2), 0.0)
        .when(p1 >= p2, 1.0).otherwise(2.0))
    multi = multiclass_metrics_frame(mc, "mpred", "my", "probs", top_ns=(1, 3))
    wide = confusion.crossJoin(q_auroc_eval(spark, sf_dir)).crossJoin(multi)
    # + OpBinScoreEvaluator per-decile calibration (formerly the separate
    # bin_score_calibration registry row, merged to free a 50-row-window
    # slot): each calibration bin row carries the one-row metrics
    bins = q_bin_score_calibration(spark, sf_dir)
    return bins.crossJoin(wide)


def q_map_vectorizer(spark, sf_dir):
    """RealMapVectorizer over the parsed props map, relationalized: fitted
    per-key mean-fill + null slot emitted as columns."""
    from .feature import from_dataframe
    from .operators.map_vectorizers import real_map_vectorizer
    ev = _t(spark, sf_dir, "events").withColumn(
        "props_map", M.parse_json_map(F.col("props"), "double"))
    feats = from_dataframe(ev, overrides={"props_map": "RealMap"})
    fitted = real_map_vectorizer(feats["props_map"], output_name="pv").fit(ev)
    vec = fitted.expr()
    return ev.select("event_id", vec).select(
        "event_id",
        F.col("pv")[0].alias("k_value"),
        F.col("pv")[1].alias("k_null"))


def q_date_list_vectorizer(spark, sf_dir):
    """DateListVectorizer SinceFirst/SinceLast over per-user event-time lists
    (explicit reference date — the reference's now() made deterministic)."""
    from .feature import from_dataframe
    from .operators.date_ops import date_list_vectorizer
    ev = _t(spark, sf_dir, "events")
    lists = ev.groupBy(F.col("user_id").cast("string").alias("key")) \
        .agg(F.collect_list("ts_ms").alias("ts_list"))
    feats = from_dataframe(lists, overrides={"ts_list": "DateTimeList"})
    st = date_list_vectorizer(feats["ts_list"], reference_date="2024-02-01 00:00:00",
                              output_name="dv")
    return lists.select("key", st.expr()).select(
        "key",
        F.col("dv")[0].alias("days_since_first"),
        F.col("dv")[1].alias("days_since_last"))


def q_geo_midpoint(spark, sf_dir):
    """Geolocation midpoint monoid (3D mean) over synthesized per-customer
    geolocations, grouped by segment."""
    from .aggregators import agg_geo_midpoint
    cust = _t(spark, sf_dir, "customer")
    geo = cust.select(
        "c_mktsegment",
        F.array((F.col("c_custkey") % 180 - 90).cast("double"),
                (F.col("c_custkey") % 360 - 180).cast("double"),
                F.lit(1.0)).alias("loc"))
    mid = geo.groupBy("c_mktsegment").agg(agg_geo_midpoint(F.col("loc")).alias("m"))
    return mid.select("c_mktsegment",
                      F.col("m")[0].alias("mid_lat"),
                      F.col("m")[1].alias("mid_lon"),
                      F.col("m")[2].alias("mid_acc"))


# Porter gate fixture: roots x tails = one morphology-rich synthetic
# word per doc_id, covering every step's suffixes (the ner/lexicon
# synthesize-from-keys pattern). Shared by the Spark arm and the oracle.
_P_ROOTS = ["hope", "rate", "motor", "control", "relat", "gener",
            "condit", "digit", "tripl", "fizz", "hop", "tan", "fall",
            "fil", "happ", "caress", "pon", "ti", "agre", "plaster",
            "conflat", "troubl", "siz", "oper", "feud"]
_P_TAILS = ["", "s", "sses", "ies", "eed", "ed", "ing", "y",
            "ational", "ization", "fulness", "biliti", "logi", "icate",
            "ative", "ness", "ement", "ion", "ous", "e"]

# Snowball gate fixtures (r10): one morphology-rich synthetic word per
# doc_id and language (roots x tails, the porter recipe), covering
# every step of each algorithm — prelude marking (bauer/pay/ennu),
# ß/umlauts, R1/R2/RV region edges, pronoun attachment in and out of
# RV (luch/d + ándoselo), the gu rules (sigu), accent removal, the
# par/col/tap RV exception, undoubling, and the ment-family verb-step
# re-entry. Shared by the Spark arm and the DuckDB oracle, whose step
# CTEs are generated from the SAME rule tables (functions/snowball).
_SB_DE_ROOTS = ["arbeit", "schön", "groß", "freund", "bedürfnis",
                "quell", "lauf", "kind", "wunder", "billig",
                "verhältnis", "bauer", "tät", "kategori", "macht",
                "äuß", "system", "nied", "geh", "feld"]
_SB_DE_TAILS = ["", "e", "en", "ern", "er", "em", "es", "s", "est",
                "st", "end", "ung", "ig", "ik", "isch", "lich",
                "heit", "keit", "igkeit", "lichkeit", "erheit",
                "enheit", "nisse", "igung", "ungen"]
_SB_FR_ROOTS = ["continu", "nation", "génér", "log", "bio", "part",
                "colomb", "tap", "pay", "citoyen", "fin", "vend",
                "aigu", "majestu", "complèt", "créat", "commenç",
                "éparpill", "act", "ennu"]
_SB_FR_TAILS = ["", "s", "e", "es", "ement", "ements", "amment",
                "emment", "ment", "ance", "iques", "ateurs", "ation",
                "logies", "ité", "ives", "eaux", "aux", "euses",
                "issement", "aient", "issions", "èrent", "ière", "ë"]
_SB_ES_ROOTS = ["logr", "gener", "compr", "luch", "beb", "d", "huy",
                "cómod", "felic", "torne", "argü", "pud", "tuy",
                "cant", "leal", "general", "sigu", "bueno", "ción",
                "atrev"]
_SB_ES_TAILS = ["", "s", "es", "os", "a", "o", "e", "icos", "able",
                "ista", "oso", "amiento", "adora", "ación", "antes",
                "logías", "ución", "encias", "amente", "mente",
                "idades", "ándoselo", "iéndose", "arían", "iésemos"]
# r10 wave 2: sv/no/da/ru — same recipe; tails cover each language's
# step-1 among, the s-rules, consonant-pair undoubling, the no
# erte/ert and da igst/undouble specials, and the ru group-1 (after
# а/я) vs group-2 endings + derivational/superlative steps.
_SB_SV_ROOTS = ["klubb", "jack", "flick", "skol", "möjlig", "vackr",
                "betyd", "översätt", "inneslutn", "frisk", "kvinn",
                "barn", "stad", "händ", "vänlig", "grund", "tidn",
                "spel", "mörk", "full"]
_SB_SV_TAILS = ["", "a", "arna", "erna", "heterna", "orna", "ade",
                "ande", "aste", "anden", "heten", "heter", "arnas",
                "hetens", "andet", "ast", "s", "es", "lig", "ig",
                "els", "löst", "fullt", "tt", "dt"]
_SB_NO_ROOTS = ["forskning", "bil", "klokk", "arbeid", "mulig",
                "sikker", "hus", "lys", "merk", "vik", "billig",
                "katt", "hund", "venn", "grunn", "avis", "spill",
                "mørk", "full", "land"]
_SB_NO_TAILS = ["", "a", "e", "ede", "ande", "ende", "ane", "ene",
                "hetene", "en", "heten", "ar", "er", "heter", "as",
                "es", "hetenes", "ens", "ets", "et", "ast", "s",
                "erte", "ert", "hetslov"]
_SB_DA_ROOTS = ["undersøg", "mulig", "billig", "dejlig", "hus", "løs",
                "væg", "arbejd", "bekendtgør", "vigt", "kraft", "kat",
                "hund", "ven", "grund", "avis", "spil", "mørk",
                "fuld", "land"]
_SB_DA_TAILS = ["", "hed", "ethed", "ered", "e", "erede", "ende",
                "erende", "ene", "erne", "ere", "en", "heden", "eren",
                "er", "heder", "heds", "endes", "ernes", "hedens",
                "et", "s", "igst", "løst", "elig"]
_SB_RU_ROOTS = ["книг", "красив", "дела", "важн", "возможн", "чита",
                "пересказ", "интересн", "женщин", "быстр", "письменн",
                "территор", "прочита", "сил", "говор", "больш",
                "работ", "нов", "хорош", "стар"]
_SB_RU_TAILS = ["", "а", "ами", "ая", "ый", "ой", "ого", "ыми",
                "ейшее", "ость", "остью", "и", "ями", "ях", "ь", "ю",
                "я", "вшись", "ывшись", "ла", "ете", "ют", "уют",
                "ить", "нный"]
_SB_IT_ROOTS = ["abbandon", "pronunci", "mangi", "port", "organizz",
                "felic", "attiv", "bio", "crocch", "abba",
                "comprend", "fin", "nazional", "gatt", "amic",
                "tecno", "ved", "parl", "generos", "cas"]
_SB_IT_TAILS = ["", "a", "e", "i", "o", "anza", "ici", "iche",
                "ismo", "abile", "ista", "oso", "mente", "atrice",
                "azione", "logia", "uzione", "enza", "amento",
                "amente", "ità", "ivo", "andolo", "arglielo",
                "erebbero"]
_SB_NL_ROOTS = ["lichamelijk", "loop", "kat", "ma", "bro", "duizelig",
                "uitdrukk", "bruikb", "vruchtb", "verduidelijk",
                "belangrijk", "huiz", "gemeen", "aanwezig", "eetb",
                "drag", "zienswijz", "voed", "werk", "speel"]
_SB_NL_TAILS = ["", "e", "en", "ene", "s", "se", "heden", "heid",
                "end", "ing", "ig", "lijk", "baar", "bar", "kken",
                "tten", "dden", "igheid", "elijk", "eren", "aar",
                "ood", "aan", "ste", "t"]
# r11 wave 4: pt/ro/fi/hu — tails cover the nasal-marker prelude +
# residual e/ci/gu + ç rules (pt), step-0 plurals, the repeated
# combining step and the consonant-or-u verb guard (ro), the guarded
# case endings, comparative and four-part tidy + undouble (fi), the
# digraph-aware R1, instrumental/factive undoubling and the owner
# chains (hu).
_SB_PT_ROOTS = ["abandon", "quilométr", "felic", "lóg", "amor",
                "propos", "gener", "administrat", "espéc", "com",
                "irm", "fal", "capaz", "bonit", "organiz", "trabalh",
                "vend", "constru", "naç", "decis"]
_SB_PT_TAILS = ["", "s", "es", "a", "o", "icos", "ável", "ista",
                "oso", "amento", "adoras", "ação", "ações", "ução",
                "ências", "amente", "mente", "idades", "ivas", "iras",
                "aram", "ará", "ássemos", "íamos", "ão"]
_SB_RO_ROOTS = ["copil", "frumo", "abil", "lucr", "import", "juc",
                "folos", "acţiun", "naţion", "băie", "măr", "citit",
                "scri", "cânt", "munc", "oraş", "ştiinţ", "prieten",
                "călător", "gând"]
_SB_RO_TAILS = ["", "ul", "ului", "aua", "ele", "elor", "ii", "iile",
                "ilor", "ile", "atei", "aţie", "abilitate",
                "ivitate", "icatori", "ativ", "ător", "ată", "oase",
                "antă", "iune", "işti", "are", "ează", "aserăm"]
_SB_FI_ROOTS = ["kirja", "talo", "suurim", "aatonaat", "nopea",
                "kala", "tyttö", "edellytyk", "käs", "opiskelij",
                "järjestelm", "mahdollisuuk", "kaup", "työ", "vuo",
                "yhteiskun", "tutkimuk", "suomalais", "perhe",
                "helsing"]
_SB_FI_TAILS = ["", "sta", "ssa", "lla", "lle", "n", "t", "a", "ä",
                "kin", "ko", "han", "sti", "si", "ni", "nsa", "mme",
                "an", "hin", "siin", "seen", "immat", "mpi", "eja",
                "tto"]
_SB_HU_ROOTS = ["ház", "szállod", "gép", "asszony", "könyv", "barát",
                "város", "kert", "ember", "alm", "madár", "tanár",
                "gyerek", "virág", "munk", "orszá", "csalá",
                "szeret", "kuty", "egyetem"]
_SB_HU_TAILS = ["", "ban", "ben", "nak", "val", "kkal", "ccsel",
                "tól", "ból", "hoz", "ig", "at", "ért", "képpen",
                "onként", "én", "astul", "á", "aké", "éi", "ünk",
                "jaim", "ák", "ok", "a"]


def _sb_word_sql(roots, tails):
    r_sql = "[" + ",".join(f"'{r}'" for r in roots) + "]"
    t_sql = "[" + ",".join(f"'{t}'" for t in tails) + "]"
    return (f"(({r_sql})[CAST(doc_id % {len(roots)} + 1 AS INT)] || "
            f"({t_sql})[CAST((doc_id // {len(roots)}) % {len(tails)}"
            f" + 1 AS INT)])")


def _sb_word_spark_sql(roots, tails):
    r_sql = ",".join(f"'{r}'" for r in roots)
    t_sql = ",".join(f"'{t}'" for t in tails)
    return (f"(element_at(array({r_sql}), CAST(doc_id % {len(roots)}"
            f" + 1 AS INT)) || element_at(array({t_sql}), "
            f"CAST((doc_id div {len(roots)}) % {len(tails)} + 1 "
            f"AS INT)))")


# stemmer step chains (snowball_spark_steps) are pure Python text —
# built in milliseconds for all 13 languages, cached per process. r12:
# this replaced the Column-tree build, whose 1-10 s of py4j round
# trips per language were ~44 s of every gate round (the r11 VERDICT's
# gate-budget finding); the step form parses as many SMALL F.expr
# texts (linear ANTLR cost, bounded DFA retention — the one-big-parse
# form measured ~300 MB retained for ru alone), same values by the
# backend law tests
_SB_STEP_CACHE: dict = {}


def _sb_lang_steps(lg: str):
    """(steps, final_expr) for one gate language — see
    functions.snowball.snowball_spark_steps."""
    if lg not in _SB_STEP_CACHE:
        from .functions.snowball import snowball_spark_steps
        _SB_STEP_CACHE[lg] = snowball_spark_steps(lg)
    return _SB_STEP_CACHE[lg]


# WordPiece gate fixture: a vocab with ## continuations + words that
# exercise greedy longest-match, continuation chains, and the
# whole-word-[UNK] dead-cursor path. Shared by both engines.
_WP_GATE_VOCAB = ["[PAD]", "[UNK]", "un", "##aff", "##able", "##ffable",
                  "run", "##ning", "##n", "##ing", "hope", "##ful",
                  "##ness", "rate", "##s", "fall", "##l", "q", "##x"]
_WP_ROOTS = ["un", "run", "hope", "rate", "fall", "qx"]
_WP_TAILS = ["", "affable", "ning", "fulness", "s", "zz"]


def q_stopwords_ngrams(spark, sf_dir):
    """OpStopWordsRemover + OpNGram as expressions over document tokens.
    Also carries JaccardSimilarity between each document and its successor
    (``next_jaccard``, null for the last doc) — formerly the separate
    text_similarity registry row, merged to free a 50-row-window slot.

    porter_word/porter (r9): the FULL Porter stemmer
    (functions/porter.py — the Lucene EnglishAnalyzer stemmer, PARITY
    delta 1a's English arm) oracle-gated end-to-end: one synthetic
    morphology-rich word per doc (roots x tails keyed by doc_id) stemmed
    by the expression chain; the DuckDB oracle replicates ALL FIVE steps
    op-for-op — the consonant-vowel skeleton as the same two regex
    rewrites, the measure as the same VC-group count, every step's
    longest-suffix-first CASE generated FROM THE SAME RULE TABLES
    (functions/porter._STEP2/3/4) as the Spark expressions.

    wp_word/wp_pieces (r9): the WordPiece greedy scan oracle-gated: a
    second synthetic word per doc over a ##-continuation vocabulary
    (greedy-vs-optimal splits, continuation chains, the dead-cursor
    whole-word-[UNK] path); the oracle replays the published cursor
    scan as a RECURSIVE CTE whose longest-first probe CASE is
    generated from the SAME fixture vocab. Since r11 the Spark side
    runs the DISTINCT-WORD df form (wordpiece_tokenize_df — the Zipf
    scale path), which equals the column form by the tokenizer laws,
    so the gate covers explode/distinct/scan-per-type/join/regroup
    end-to-end.

    sb_* (r10 de/fr/es/sv/no/da/ru/it/nl, r11 pt/ro/fi/hu): the FULL
    Snowball stemmers (functions/snowball.py — PARITY delta 1a arms)
    oracle-gated end-to-end: one morphology-rich word per doc and
    language (roots x tails), stemmed by the Catalyst chain on the
    Spark side and by CTE-per-step DuckDB SQL on the oracle side, BOTH
    generated from the same rule tables by the same step interpreter
    (snowball_sql_ctes) — prelude marking, R1/R2/RV arithmetic, every
    suffix step, undoubling, un-accenting, postlude; r11 adds the pt
    nasal markers + residual rules, the ro unrolled combining step +
    verb guards, the fi guarded case amongs + tidy/undouble, and the
    hu digraph-aware R1 + owner chains. The 13 per-language snapshot
    sub-jobs run as concurrent Spark jobs; the oracle CTEs are
    MATERIALIZED so DuckDB never re-inlines a step."""
    from .functions.porter import porter_stem
    from .llm.textqual import STOPWORD_PROFILES
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokenize(F.col("text"))
    nostop = TX.remove_stopwords(toks, STOPWORD_PROFILES["en"])
    bigrams = TX.ngrams(nostop, 2)
    root = F.element_at(F.array(*[F.lit(r) for r in _P_ROOTS]),
                        (F.col("doc_id") % len(_P_ROOTS) + 1).cast("int"))
    tail = F.element_at(
        F.array(*[F.lit(t) for t in _P_TAILS]),
        (F.floor(F.col("doc_id") / len(_P_ROOTS)).cast("long")
         % len(_P_TAILS) + 1).cast("int"))
    word = F.concat(root, tail)
    wp_model = {"vocab": {p: i for i, p in enumerate(_WP_GATE_VOCAB)},
                "unk": "[UNK]",
                "max_piece_len": max(len(p) for p in _WP_GATE_VOCAB)}
    wp_word = F.concat(
        F.element_at(F.array(*[F.lit(r) for r in _WP_ROOTS]),
                     (F.col("doc_id") % len(_WP_ROOTS) + 1).cast("int")),
        F.element_at(
            F.array(*[F.lit(t) for t in _WP_TAILS]),
            (F.floor(F.col("doc_id") / len(_WP_ROOTS)).cast("long")
             % len(_WP_TAILS) + 1).cast("int")))
    # Each language runs as its OWN small job whose 3-column result is
    # snapshotted driver-side and local-joined back, built with the
    # STEP backend (r12) and evaluated INTERPRETED. Both choices are
    # about a stock 1g driver surviving the whole 50-query sweep AND
    # the r11 gate-budget finding (the sweep doubled to 75-90 s):
    # (1) the step backend (snowball_spark_steps) assembles pure
    # Python text in milliseconds and parses each step/chunk as a
    # SMALL F.expr — neither the Column backend's 1-10 s of py4j
    # round trips per language (~44 s of every gate round, measured)
    # nor the one-big-parse snowball_spark_sql form's superlinear
    # ANTLR cost and STATIC DFA-cache retention (40-70 MB per
    # language, ~430 MB JVM-lifetime, measured r11 — a 1g gate sweep
    # dies on it; small chunked parses retain a bounded fraction).
    # (2) NO_CODEGEN skips Janino entirely — at 500-5000 fixture rows
    # interpreted evaluation is instant and nothing lands in the
    # codegen cache.
    _SB_SNAP_CAP = 20_000
    n_docs = docs.count()
    if n_docs > _SB_SNAP_CAP:
        raise ValueError(
            f"q_stopwords_ngrams snowball snapshot expects <= "
            f"{_SB_SNAP_CAP} documents (driver-side per-language "
            "snapshots are a gate-scale shape); run snowball_stem "
            "directly at larger scales")
    # interpreted evaluation for the stemmer sub-jobs: at 500-5000
    # fixture rows codegen buys nothing, and eight Janino-compiled
    # stemmer classes RETAINED in the codegen cache are what pushed a
    # stock 1g driver over the edge mid-sweep (driver_sim r10); both
    # confs are restored whatever happens
    _factory_key = "spark.sql.codegen.factoryMode"
    _wscg_key = "spark.sql.codegen.wholeStage"
    _old_factory = spark.conf.get(_factory_key, "FALLBACK")
    _old_wscg = spark.conf.get(_wscg_key, "true")
    sb_joined = None
    try:
        spark.conf.set(_factory_key, "NO_CODEGEN")
        spark.conf.set(_wscg_key, "false")

        # the 13 per-language sub-jobs are independent tiny collects —
        # each builds its stemmer as a chain of SMALL parsed step
        # expressions (snowball_spark_steps, r12: replaced the 1-10 s
        # py4j Column build per language) applied as withColumn
        # projections, then runs its snapshot job; threads overlap the
        # parse/analyze with evaluation across languages; order of the
        # local joins is pinned by the fixture list
        def snap_one(lg):
            steps, fin = _sb_lang_steps(lg)
            roots, tails = next((r, t) for lang, r, t in _SB_FIXTURES
                                if lang == lg)
            lg_df = docs.selectExpr(
                "doc_id",
                f"{_sb_word_spark_sql(roots, tails)} AS w0")
            for name, val in steps:
                lg_df = lg_df.withColumn(name, F.expr(val))
            lg_df = lg_df.selectExpr(
                "doc_id", f"w0 AS sb_{lg}_word", f"({fin}) AS sb_{lg}")
            return spark.createDataFrame(lg_df.collect(), lg_df.schema)

        from concurrent.futures import ThreadPoolExecutor
        langs = [f[0] for f in _SB_FIXTURES]
        with ThreadPoolExecutor(max_workers=len(langs)) as ex:
            for snap in ex.map(snap_one, langs):
                sb_joined = snap if sb_joined is None \
                    else sb_joined.join(snap, "doc_id")
    finally:
        spark.conf.set(_factory_key, _old_factory)
        spark.conf.set(_wscg_key, _old_wscg)
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(nostop).cast("long").alias("n_tokens_nostop"),
        F.size(bigrams).cast("long").alias("n_bigrams"),
        F.coalesce(F.try_element_at(bigrams, F.lit(1)), F.lit("")).alias("first_bigram"),
        word.alias("porter_word"),
        porter_stem(word).alias("porter"),
        wp_word.alias("wp_word"))
    # wp_pieces rides the DISTINCT-WORD df form (r11) — the Zipf scale
    # path (explode -> scan once per word type -> join back) gated
    # against the SAME recursive-CTE oracle as the column form, which
    # it equals by the tokenizer law tests
    from .llm.tokenizer import wordpiece_tokenize_df
    base = wordpiece_tokenize_df(base, "wp_word", wp_model, "doc_id",
                                 out_col="_wpp")
    base = base.withColumn("wp_pieces", F.array_join("_wpp", " ")) \
        .drop("_wpp")
    base = base.join(sb_joined, "doc_id")
    sim = q_text_similarity(spark, sf_dir).select(
        F.col("id1").alias("doc_id"),
        F.col("token_jaccard").alias("next_jaccard"))
    return base.join(sim, "doc_id", "left")


def q_multilabel_topn(spark, sf_dir):
    """TopNLabelProbMap / TopNLabelJoiner: deterministic probability triple
    per order -> argmax label + prob (ties -> label ascending)."""
    from .operators.multilabel import top_n_label_prob_map
    o = _t(spark, sf_dir, "orders")
    probs = F.array((F.col("o_totalprice") % 97) / 97.0,
                    (F.col("o_totalprice") % 89) / 89.0,
                    (F.col("o_totalprice") % 83) / 83.0)
    m = top_n_label_prob_map(["a", "b", "c"], probs, 1)
    entry = F.map_entries(m)[0]
    return o.select("o_orderkey",
                    entry["key"].alias("top1_label"),
                    entry["value"].alias("top1_p"))


def q_name_lang_detect(spark, sf_dir):
    """HumanNameDetector + LangDetector confidences (dictionary membership +
    stopword profiles, both pure expressions).

    r7 adds the STATISTICAL detector (llm/langid_nb — the Optimaize NB
    family, trained not shipped): a char-bigram Naive Bayes is FIT on the
    doc_id < 100 slice in portable mode (every model log-probability
    rounded 6dp at fit; vocabulary = top-500 grams, ties by gram) and
    classifies every document as pure expressions — the oracle replicates
    the ENTIRE train-then-classify path in SQL: gram counting, the vocab
    cut, Laplace smoothing with explicit DOUBLE casts, ln at 6dp, doc
    priors, the per-doc DECIMAL(18,6) fold / gram count, and the
    argmax with alphabetical tie-break (nb_pred, nb_en, nb_de)."""
    from .llm.langid_nb import (nb_language_id, nb_language_scores,
                                train_language_classifier)
    from .operators.detectors import is_human_name, language_scores
    docs = _t(spark, sf_dir, "documents")
    fake_name = F.concat(
        F.element_at(F.array(F.lit("James"), F.lit("Maria"), F.lit("Wei"), F.lit("Zzyzx")),
                     (F.col("doc_id") % 4 + 1).cast("int")),
        F.lit(" Smith"))
    scores = language_scores(F.col("text"))
    nbm = train_language_classifier(docs.where(F.col("doc_id") < 100),
                                    "text", "lang", n=2, max_vocab=500,
                                    portable=True)
    nbs = nb_language_scores(F.col("text"), nbm)
    return docs.select(
        "doc_id",
        fake_name.alias("synth_name"),
        is_human_name(fake_name).alias("is_name"),
        F.try_element_at(scores, F.lit("en")).alias("score_en"),
        F.try_element_at(scores, F.lit("de")).alias("score_de"),
        nb_language_id(F.col("text"), nbm).alias("nb_pred"),
        (F.try_element_at(nbs, F.lit("en")) + F.lit(0.0)).alias("nb_en"),
        (F.try_element_at(nbs, F.lit("de")) + F.lit(0.0)).alias("nb_de"))


# deterministic chunk-synthesis lists for the trainable-NER gate: built
# into BOTH the Spark query and the oracle SQL from documents.doc_id, so
# the fixture is derivable on each side with zero data exchange
_NER_FIRSTS = ["James", "Maria", "John", "Linda", "Robert", "Susan",
               "David", "Anna"]
_NER_SURS = ["Smith", "Jones", "Miller", "Davis", "Wilson", "Moore",
             "Taylor", "Clark"]
_NER_LOCS = ["London", "Paris", "Berlin", "Tokyo", "Chicago", "Boston",
             "Germany", "Canada"]
_NER_STEMS = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
              "Hooli", "Vandelay"]
_NER_SUFS = ["Inc", "Corp", "Bank", "Labs"]
_NER_MONTHS = ["January", "February", "March", "April", "June", "July",
               "August", "September"]

# maxent gate fixture (the injection pattern): a GIS weight table
# GENERATED from the same name lists — one source of truth, two engines
_MX_OUTCOMES = ["PERSON", "LOCATION", "ORGANIZATION", "DATE"]


def _mx_weights() -> dict:
    w: dict[str, dict[str, float]] = {}

    def add(pred, outcome, v):
        w.setdefault(pred, {})[outcome] = \
            w.get(pred, {}).get(outcome, 0.0) + v

    for n in _NER_FIRSTS:
        add(f"first={n.lower()}", "PERSON", 1.75)
    for n in _NER_LOCS:
        add(f"first={n.lower()}", "LOCATION", 1.5)
    for n in _NER_STEMS:
        add(f"first={n.lower()}", "ORGANIZATION", 1.25)
    for n in _NER_MONTHS:
        add(f"first={n.lower()}", "DATE", 2.25)
    for s in _NER_SUFS:
        add(f"suf3={s.lower()[-3:]}", "ORGANIZATION", 2.5)
    add("shape=multi", "PERSON", 0.25)
    add("shape=multi", "ORGANIZATION", 0.125)
    add("shape=single", "LOCATION", 0.25)
    return w


# beam-decoding gate fixture (r11 — retires the last law-only r10
# algorithm): a TOKEN-level GIS model with -start/-cont outcomes and
# pd=<prevOutcome> coupling, generated from the same name lists (per-name
# 0.01*i jitter so every list slot produces a distinct score path), plus
# 4-token sentences synthesized from doc_id. Three patterns exercise the
# NameFinderSequenceValidator both at BOS (a surname first — person-cont
# must be pruned with no predecessor) and mid-sequence (a surname after
# 'other' — person-cont pruned again).
_NER_LOWS = ["visited", "in", "from", "met"]
_BEAM_OUTCOMES = ["other", "person-start", "person-cont", "location-start"]


def _beam_weights() -> dict:
    w: dict[str, dict[str, float]] = {}

    def add(pred, outcome, v):
        w.setdefault(pred, {})[outcome] = v

    for i, n in enumerate(_NER_FIRSTS):
        add(f"wl={n.lower()}", "person-start", 2.0 + 0.01 * i)
        add(f"wl={n.lower()}", "person-cont", 0.45)
        add(f"pw={n}", "person-cont", 0.3)
    for i, s in enumerate(_NER_SURS):
        add(f"wl={s.lower()}", "person-cont", 1.8 + 0.01 * i)
        add(f"wl={s.lower()}", "location-start", 0.6)
        add(f"nw={s}", "person-start", 0.35)
    for i, c in enumerate(_NER_LOCS):
        add(f"wl={c.lower()}", "location-start", 2.1 + 0.01 * i)
        add(f"wl={c.lower()}", "person-cont", 0.4)
    for i, v in enumerate(_NER_LOWS):
        add(f"wl={v}", "other", 1.9 + 0.01 * i)
    add("wc=ic", "person-start", 0.3)
    add("wc=ic", "location-start", 0.25)
    add("wc=lc", "other", 0.8)
    add("pd=other", "person-start", 0.2)
    add("pd=person-start", "person-cont", 1.2)
    add("pd=person-start", "person-start", -0.4)
    add("pd=person-start", "other", -0.3)
    add("pd=person-cont", "person-cont", 0.5)
    add("pd=person-cont", "other", 0.2)
    add("pd=location-start", "other", 0.4)
    add("pd=location-start", "location-start", -0.2)
    return w


def q_ner_trainable(spark, sf_dir):
    """Trainable statistical NER (operators/ner_nb — the OpenNLP
    NameEntityRecognizer.scala:56 family, TRAINED not shipped; the
    langid_nb pattern applied to entity chunks). A labeled chunk fixture
    is synthesized deterministically from doc_id (PERSON 'First Sur',
    LOCATION, ORGANIZATION 'Stem Suffix', DATE month — list literals on
    both sides), the NB chunk classifier is FIT in portable mode on the
    doc_id < 400 slice (feature bag per chunk: first=/last=/suf3=/
    shape=/nw=; vocab = top-300 features, ties by feature asc; every
    model log-prob rounded 6dp at fit), and every chunk is classified as
    pure expressions. The oracle replicates the ENTIRE train-then-
    classify path in SQL: feature bags, counts, the vocab cut, Laplace
    smoothing with explicit DOUBLE casts, ln at 6dp, priors, the
    DECIMAL(18,6) feature fold + prior, and the argmax with alphabetical
    tie-break. Columns: doc_id, chunk, label (synthesized truth), pred,
    s_per / s_org (PERSON / ORGANIZATION scores).

    mx_pred/mx_sper (r9): the OpenNLP GIS MAXENT scorer
    (operators/maxent.py — PARITY delta 3a's model-data tier) gated via
    model INJECTION (the OPQ pattern): a fixture weight table generated
    from the same name lists rides both engines as identical literals;
    the oracle folds the per-outcome weight sums in the expression
    fold's exact left-associative feature order and replicates the
    published FIRST-max-in-OUTCOME-order tie rule (>= CASE cascade) —
    distinct from the NB arm's alphabetical ties.

    beam_tags/beam_sc (r11): TOKEN-level width-3 BEAM decoding
    (operators/maxent.maxent_beam_tag — NameFinderME/BeamSearch
    semantics: per-position maxent distributions, pd=<prevOutcome>
    coupling, the NameFinderSequenceValidator, 9dp per-step log-prob
    rounding) gated by model injection: the _beam_weights() fixture and
    4-token sentences synthesized from doc_id ride both engines, and
    the oracle replicates the ENTIRE beam — per-position base sums in
    the scorer's left-associative feature fold order, the per-extension
    softmax normalizer folded in outcome order, validity pruning at BOS
    and mid-sequence, top-3 selection by (score DESC, outcome-index
    sequence ASC) — unrolled position by position in SQL."""
    from .operators.maxent import (maxent_beam_decode,
                                   maxent_beam_spans,
                                   maxent_best_outcome, maxent_sums)
    from .operators.ner_nb import (chunk_features, ner_nb_label,
                                   ner_nb_scores, train_ner_classifier)
    docs = _t(spark, sf_dir, "documents")
    i = F.floor(F.col("doc_id") / 4)

    def pick(lst, idx):
        return F.element_at(F.array(*[F.lit(x) for x in lst]),
                            (idx % len(lst) + 1).cast("int"))

    chunk = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(pick(_NER_FIRSTS, i), F.lit(" "),
                        pick(_NER_SURS, F.floor(i / 3))))
        .when(F.col("doc_id") % 4 == 1, pick(_NER_LOCS, i))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(pick(_NER_STEMS, i), F.lit(" "),
                       pick(_NER_SUFS, F.floor(i / 3))))
        .otherwise(pick(_NER_MONTHS, i)))
    label = (F.when(F.col("doc_id") % 4 == 0, F.lit("PERSON"))
             .when(F.col("doc_id") % 4 == 1, F.lit("LOCATION"))
             .when(F.col("doc_id") % 4 == 2, F.lit("ORGANIZATION"))
             .otherwise(F.lit("DATE")))
    base = docs.select("doc_id", chunk.alias("chunk"),
                       label.alias("label"))
    m = train_ner_classifier(base.where(F.col("doc_id") < 400), "chunk",
                             "label", max_vocab=300, portable=True)
    scores = ner_nb_scores(F.col("chunk"), m)
    mx = {"type": "GIS", "outcomes": list(_MX_OUTCOMES),
          "labels": list(_MX_OUTCOMES), "weights": _mx_weights(),
          "correction_constant": 1, "correction_param": 0.0,
          "context": False}
    feats = chunk_features(F.col("chunk"))
    mx_sums = maxent_sums(feats, mx)
    # beam fixture: 4-token sentences + the pd-coupled token model
    bm = {"type": "GIS", "outcomes": list(_BEAM_OUTCOMES),
          "labels": list(_BEAM_OUTCOMES), "weights": _beam_weights(),
          "correction_constant": 1, "correction_param": 0.0,
          "context": False}
    j = F.floor(F.col("doc_id") / 3)
    btoks = (
        F.when(F.col("doc_id") % 3 == 0,
               F.array(pick(_NER_FIRSTS, j), pick(_NER_SURS, F.floor(j / 3)),
                       pick(_NER_LOWS, j), pick(_NER_LOCS, F.floor(j / 5))))
        .when(F.col("doc_id") % 3 == 1,
              F.array(pick(_NER_SURS, j), pick(_NER_FIRSTS, F.floor(j / 3)),
                      pick(_NER_LOWS, j), pick(_NER_SURS, F.floor(j / 5))))
        .otherwise(
            F.array(pick(_NER_LOCS, j), pick(_NER_LOWS, j),
                    pick(_NER_FIRSTS, F.floor(j / 3)),
                    pick(_NER_SURS, F.floor(j / 5)))))
    base = base.withColumn("_btoks", btoks)
    bdec = maxent_beam_decode(F.col("_btoks"), bm, beam=3, validate=True)
    base = base.withColumn("_bdec", bdec)
    spans = maxent_beam_spans(F.col("_btoks"), bm, beam=3,
                              validate=True)
    base = base.withColumn(
        "_bspans",
        F.array_join(F.transform(
            spans,
            lambda s: F.concat(s["type"], F.lit(":"),
                               s["start"].cast("string"), F.lit("-"),
                               s["end"].cast("string"), F.lit("="),
                               s["text"])), "|"))
    return base.select(
        "doc_id", "chunk", "label",
        ner_nb_label(F.col("chunk"), m).alias("pred"),
        (F.try_element_at(scores, F.lit("PERSON")) + F.lit(0.0))
        .alias("s_per"),
        (F.try_element_at(scores, F.lit("ORGANIZATION")) + F.lit(0.0))
        .alias("s_org"),
        maxent_best_outcome(feats, mx).alias("mx_pred"),
        (F.try_element_at(mx_sums, F.lit("PERSON")) + F.lit(0.0))
        .alias("mx_sper"),
        F.concat_ws(" ", F.col("_bdec")["tags"]).alias("beam_tags"),
        (F.col("_bdec")["sc"] + F.lit(0.0)).alias("beam_sc"),
        F.col("_bspans").alias("beam_spans"))


# lexicon-segmentation gate fixture: real zh words with overlapping
# prefixes (中国 / 中国人, 人民 / 民银 / 银行) so the least-cost path is a
# genuine lattice decision, prime-ish costs so path sums rarely tie (and
# ties break identically on both sides: (cost, backpointer) ascending)
_SEG_LEX = [("中国", 0.97), ("中国人", 1.13), ("人民", 1.27),
            ("民银", 1.31), ("银行", 0.89), ("我", 0.71), ("是", 0.61),
            ("的", 0.83)]
_SEG_WORDS = [w for w, _ in _SEG_LEX]
# class-transition (Kuromoji cost model) gate fixture: classes per word +
# a connection matrix whose costs genuinely steer paths (N->N expensive,
# function-word transitions cheap)
_SEG_CLS = {"中国": "N", "中国人": "N", "人民": "N", "民银": "N",
            "银行": "N", "我": "PRON", "是": "V", "的": "PART"}
_SEG_CONN = {("BOS", "PRON"): 0.0, ("BOS", "N"): 0.11, ("PRON", "V"): 0.0,
             ("V", "N"): 0.19, ("N", "N"): 0.79, ("N", "PART"): 0.13,
             ("PART", "N"): 0.29, ("N", "UNK"): 0.17, ("UNK", "N"): 0.23,
             ("N", "EOS"): 0.0, ("UNK", "EOS"): 0.07}
# SentencePiece-unigram df-form gate fixture (r12): ambiguous 1-3-char
# pieces over {a,b} so least-cost genuinely beats greedy ("▁ab" vs
# "▁a"+"b" vs "▁"+"ab"), ▁-only and ▁-prefixed boundary pieces, costs
# spaced >= 0.1 so path sums never near-tie across the per-word /
# whole-text float offsets; max piece length 3 chars matches the
# oracle dp's window. No piece has an internal ▁ — the precondition
# for unigram_tokenize_df's per-word decomposition
_UG_WORDS = ["aba", "ab", "ba", "a", "b", "bb", "aab", "bba"]
_UG_VOCAB = [("▁a", 1.2), ("▁ab", 2.0), ("a", 1.1),
             ("b", 1.3), ("ab", 1.9), ("ba", 1.8), ("▁b", 2.2),
             ("▁", 1.0), ("aa", 2.4), ("bb", 2.6)]
_UG_UNK = 12.6  # max(cost) + 10 — the spm unknown-fallback convention


def q_lexicon_segment(spark, sf_dir):
    """Viterbi dictionary segmentation (functions/text.lexicon_segment —
    the Kuromoji/SmartCN/ThaiAnalyzer least-cost-path algorithm with a
    caller-supplied lexicon), ORACLE-GATED: texts are synthesized from
    doc_id as 3-word concatenations over an ambiguous zh lexicon
    (overlapping prefixes force real lattice decisions), every 5th doc
    appends an out-of-lexicon char (the unknown-char single-token path),
    and the DuckDB oracle replicates the ENTIRE algorithm — the dp
    lattice as a recursive CTE carrying the (cost, backpointer) list,
    candidate min by (cost, bp) ascending, the backtrack walk, and the
    token split — so the engine's aggregate-lattice expression form is
    value-gated against an independent implementation.

    part='lattice' (r8b): the FULL Kuromoji/MeCab cost model
    (lexicon_segment_lattice — word costs + class-transition costs with
    BOS/EOS boundaries, emitting (token, class)); the oracle replicates
    the positions x classes dp (per-class candidate min over window
    words AND prev classes, identical (cost, bpi, bpc) tie order and
    wc + (dp + conn) IEEE association) plus the (position, class)
    backtrack. Output: (doc_id, part, tok_idx, token, cls) — plain rows
    carry cls=NULL.

    part='join' (r9): the BROADCAST-JOIN form
    (operators/segmentation.lexicon_segment_join — dictionary as a
    broadcast DataFrame, candidate-span explode + one broadcast hash
    join + the identical dp over matched arcs; the scale path for
    Kuromoji-size dictionaries where a plan-literal map would be
    multi-MB). Same answer as 'plain' by construction, so the oracle
    emits its recursive-CTE replica under both labels — the join form's
    arc mining, grouping, and arc-dp all sit in the hash gate.

    part='unigram' (r12): the DISTINCT-WORD SentencePiece-unigram form
    (llm/tokenizer.unigram_tokenize_df — whitespace pre-tokenize into
    ▁-prefixed words, Viterbi once per word TYPE via the join
    segmenter's text-value dedup, ordered regroup per doc). Texts are
    two-word concatenations over an ambiguous {a,b} piece vocabulary
    with ▁ boundary pieces; every 5th doc gets an in-word unknown char
    and every 7th a whole unknown word (the max(cost)+10 fallback).
    The oracle replays the WHOLE-TEXT dp over the ▁-marked string with
    the same recursive-CTE replica — the df form equals it by the ▁
    boundary-forcing decomposition (no internal-▁ pieces in the
    fixture vocab), so the gate pins the decomposition itself, not
    just the shared dp."""
    from .functions.text import lexicon_segment, lexicon_segment_lattice
    from .operators.segmentation import lexicon_segment_join
    docs = _t(spark, sf_dir, "documents")
    warr = F.array(*[F.lit(w) for w in _SEG_WORDS])
    text = F.concat(
        F.element_at(warr, (F.col("doc_id") % 8 + 1).cast("int")),
        F.element_at(warr, (F.floor(F.col("doc_id") / 8) % 8 + 1).cast("int")),
        F.element_at(warr, (F.floor(F.col("doc_id") / 64) % 8 + 1).cast("int")))
    text = F.when(F.col("doc_id") % 5 == 0,
                  F.concat(text, F.lit("卡"))).otherwise(text)
    toks = lexicon_segment(text, dict(_SEG_LEX), unknown_cost=2.0)
    plain = docs.select("doc_id", toks.alias("_t")) \
        .select(F.lit("plain").alias("part"), "doc_id",
                F.posexplode("_t").alias("tok_idx", "token")) \
        .withColumn("cls", F.lit(None).cast("string"))
    typed_lex = {w: (cost, _SEG_CLS[w]) for w, cost in _SEG_LEX}
    ttoks = lexicon_segment_lattice(text, typed_lex, _SEG_CONN,
                                    unknown_cost=2.0)
    lattice = docs.select("doc_id", ttoks.alias("_t")) \
        .select(F.lit("lattice").alias("part"), "doc_id",
                F.posexplode("_t").alias("tok_idx", "e")) \
        .select("part", "doc_id", "tok_idx",
                F.col("e.token").alias("token"),
                F.col("e.cls").alias("cls"))
    lex_df = spark.createDataFrame(
        [(w, float(c)) for w, c in _SEG_LEX], "word string, cost double")
    jtoks = lexicon_segment_join(docs.select("doc_id", text.alias("_s")),
                                 "_s", lex_df, out_col="_t",
                                 unknown_cost=2.0)
    join_part = jtoks.select(F.lit("join").alias("part"), "doc_id",
                             F.posexplode("_t").alias("tok_idx", "token")) \
        .withColumn("cls", F.lit(None).cast("string"))
    from .llm.tokenizer import unigram_tokenize_df
    uarr = F.array(*[F.lit(w) for w in _UG_WORDS])
    utext = F.concat(
        F.element_at(uarr, (F.col("doc_id") % 8 + 1).cast("int")),
        F.lit(" "),
        F.element_at(uarr,
                     (F.floor(F.col("doc_id") / 8) % 8 + 1).cast("int")))
    utext = F.when(F.col("doc_id") % 5 == 0,
                   F.concat(utext, F.lit("z"))).otherwise(utext)
    utext = F.when(F.col("doc_id") % 7 == 0,
                   F.concat(utext, F.lit(" z"))).otherwise(utext)
    uvocab = spark.createDataFrame(
        [(p, float(c)) for p, c in _UG_VOCAB],
        "piece string, cost double")
    useg = unigram_tokenize_df(
        docs.select("doc_id", utext.alias("_u")), "_u", uvocab,
        id_col="doc_id", out_col="_t", unknown_cost=_UG_UNK)
    uni_part = useg.select(F.lit("unigram").alias("part"), "doc_id",
                           F.posexplode("_t").alias("tok_idx", "token")) \
        .withColumn("cls", F.lit(None).cast("string"))
    return plain.unionByName(lattice).unionByName(join_part) \
        .unionByName(uni_part) \
        .select("doc_id", "part", "tok_idx", "token", "cls")


def q_raw_feature_filter(spark, sf_dir):
    """RawFeatureFilter fill-rate sweep (exact ratios) PLUS a Deequ-style
    expectations report (operators/expectations.check_report) over the
    same lineitem scan — part='fill' / part='expect' rows. The expectation
    metrics chosen here are all EXACT (non-null fractions, exact distinct
    ratio, in-range and allowed-value fractions — single IEEE divisions of
    long counts), so the whole constraint layer is hash-gated against the
    SQL replica, including a deliberately FAILING constraint
    (unique(l_orderkey): lineitem repeats order keys)."""
    from .operators.expectations import (allowed_values, check_report,
                                         complete, in_range, satisfies,
                                         unique)
    li = _t(spark, sf_dir, "lineitem")
    li = li.withColumn("qty_sparse", F.when(F.col("l_quantity") > 10, F.col("l_quantity")))
    n = F.count(F.lit(1))
    fills = li.agg(
        (F.count("l_quantity") / n).alias("fill_qty"),
        (F.count("qty_sparse") / n).alias("fill_qty_sparse"),
        (F.count("l_returnflag") / n).alias("fill_flag"))
    fill_rows = fills.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("name"), F.col(c).alias("metric"))
        for c in ("fill_qty", "fill_qty_sparse", "fill_flag")])).alias("r"))         .select(F.lit("fill").alias("part"), F.col("r.name").alias("name"),
                F.col("r.metric").alias("metric"),
                F.lit(None).cast("double").alias("threshold"),
                F.lit(None).cast("boolean").alias("passed"))
    report = check_report(li, [
        complete("l_quantity", 1.0),
        unique("l_orderkey"),
        in_range("l_discount", 0.0, 0.1, 0.95),
        allowed_values("l_returnflag", ["A", "N", "R"], 1.0),
        satisfies("qty_positive", F.col("l_quantity") > 0, 1.0),
    ]).select(F.lit("expect").alias("part"),
              F.col("constraint").alias("name"), "metric", "threshold",
              "passed")
    return fill_rows.unionByName(report)


# ---------------------------------------------------------------------------
# LLM-pipeline operators
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup groups (part='full') PLUS the persisted incremental
    digest registry driven end-to-end (part='incremental', r6): documents
    fed in two batches (doc_id parity) through exact_dedup_incremental —
    CowSnapshot digest buckets, first-wins registration, bucket-pruned
    probes (llm/dedup.py) — must keep exactly the SQL closed form:
    representative = arg-min by (batch, doc_id) per digest. This is the
    100-TB ingest path: a batch never rescans prior corpus text."""
    import tempfile
    docs = _t(spark, sf_dir, "documents")
    full = dedup.exact_dedup(docs, "doc_id", "text").select(
        F.lit("full").alias("part"), "digest",
        F.col("representative").cast("long").alias("representative"),
        F.col("dup_count").cast("long").alias("dup_count"))
    p = tempfile.mkdtemp(prefix="dedup_exact_registry_")
    k0 = dedup.exact_dedup_incremental(
        spark, p, docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text",
        batch_id=0, n_buckets=16)
    k1 = dedup.exact_dedup_incremental(
        spark, p, docs.where(F.col("doc_id") % 2 == 1), "doc_id", "text",
        batch_id=1, n_buckets=16)
    incr = k0.unionByName(k1).select(
        F.lit("incremental").alias("part"),
        dedup.text_digest(F.col("text")).alias("digest"),
        F.col("doc_id").cast("long").alias("representative"),
        F.lit(None).cast("long").alias("dup_count"))
    return full.unionByName(incr)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup n-gram-Jaccard pairs (part='pair', with the scale-safe
    shingle doc-frequency cap ON — hot shingles in > 200 docs are dropped
    from the inverted index; they generate O(df²) candidates) PLUS
    connected components over those pairs -> cluster assignments
    (part='cluster'; iterative label propagation; oracle = recursive SQL
    reachability). Formerly the separate dedup_near_ngram and
    dedup_clusters registry rows; merged (pairs are mined ONCE at
    threshold 0.3 and feed both outputs) to free a 50-row-window slot.

    r6 adds part='span': EXACT SUBSTRING dedup (llm/dedup.duplicated_spans,
    Lee et al. 2021 ExactSubstr re-expressed for Spark) — merged cut
    intervals of every duplicated >=8-token window (keep-first), portable
    md5 hashes so the oracle replicates window hashing, the keep-first
    row_number and the interval merge exactly (a=doc_id, b=span_start,
    common=span_end).

    r6 also adds part='editdist': PassJoin edit-distance self-join
    (sources/similarity_join.py, pigeonhole segment blocking — no O(n²)
    pair enumeration) over distinct part names at max_dist=3, entity id =
    min p_partkey per name. The oracle is the BRUTE-FORCE all-pairs
    Levenshtein (plus the provably-safe length band), so a hash match
    proves the blocking generated EVERY true pair — the completeness
    property the operator's scale story rests on (a=id1, b=id2,
    common=dist)."""
    docs = _t(spark, sf_dir, "documents")
    # snapshot the mined pairs driver-side (bounded: ~1k rows at sf0.1):
    # they feed BOTH the pair rows and the connected-components edge
    # table — one shingle/inverted-index pass, no persist outliving the
    # query (r7 review)
    pairs_live = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                           threshold=0.3, max_doc_freq=200)
    pairs = spark.createDataFrame(pairs_live.collect(), pairs_live.schema)
    pair_rows = pairs.select(
        F.lit("pair").alias("part"),
        F.col("id1").cast("long").alias("a"), F.col("id2").cast("long").alias("b"),
        F.col("common").cast("long").alias("common"), F.col("jaccard"))
    cluster_rows = dedup.duplicate_clusters(pairs).select(
        F.lit("cluster").alias("part"),
        F.col("doc").cast("long").alias("a"),
        F.col("cluster_id").cast("long").alias("b"),
        F.lit(None).cast("long").alias("common"),
        F.lit(None).cast("double").alias("jaccard"))
    span_rows = dedup.duplicated_spans(docs, "doc_id", "text", min_len=8,
                                       portable=True).select(
        F.lit("span").alias("part"),
        F.col("doc_id").cast("long").alias("a"),
        F.col("span_start").cast("long").alias("b"),
        F.col("span_end").cast("long").alias("common"),
        F.lit(None).cast("double").alias("jaccard"))
    names = (_t(spark, sf_dir, "part")
             .groupBy("p_name").agg(F.min("p_partkey").alias("pid")))
    ed_rows = edit_distance_self_join(names, "pid", "p_name", 3).select(
        F.lit("editdist").alias("part"),
        F.col("id1").cast("long").alias("a"),
        F.col("id2").cast("long").alias("b"),
        F.col("dist").cast("long").alias("common"),
        F.lit(None).cast("double").alias("jaccard"))
    return pair_rows.union(cluster_rows).union(span_rows).union(ed_rows)


def q_corpus_mixture(spark, sf_dir):
    """Curation: deterministic per-language mixture sampling + counts
    (hash-filter sampling — reproducible on any cluster layout), plus
    benchmark decontamination (llm/decontam.py): per language, how many
    sampled docs share an 8-word n-gram with the 'eval set' (doc_id % 10
    == 0). The oracle replicates the n-gram overlap with string n-grams,
    so the broadcast-probe hash path is value-verified end to end.

    Also per language: a PORTABLE KMV distinct-text estimate (k=64,
    operators/sketches.kmv_partial portable mode — md5-derived unit hashes)
    whose k-smallest selection and (k-1)/u_k estimator the oracle replicates
    step-for-step, value-gating the sketch machinery itself.

    r6: the two remaining law-only curation samplers are hash-gated as
    merged parts (columns part, lang, a, b, c, d): part='strat' =
    stratified_fixed_sample (exactly min(20, group size) docs per lang in
    id-hash order), part='budget' = token_budget_sample (per-lang char
    budgets, cumulative-sum window in id-hash order, first-crossing row
    kept; zh absent from the budget dict -> dropped entirely). Both are
    layout-independent by construction, which is exactly what the oracle
    proves.

    part='pack' (r6): pack_sequences — deterministic concat-then-chunk
    sequence packing (per-lang token streams in id-hash order, 2048-char
    sequences); the oracle replicates stream offsets and the exact
    integer chunk indexes (a=doc_id, b=stream_offset, c=last_seq,
    d=first_seq).

    part='chunk' (r6): chunk_documents — overlapping token-window
    chunking (32-token chunks, 8 overlap); the lang column carries
    md5(chunk_text) so chunk CONTENT is value-gated, not just counts
    (a=doc_id, b=chunk_id, c=n_chunk_tokens).

    part='repeat' (r6): domain_reweight — epochs-per-domain mixture
    reweighting (The Pile / DoReMi pattern): per-lang repeat factor
    r_d = (scale*share_d*N)/n_d, integer epochs guaranteed, fractional
    remainder decided by the deterministic id-hash; the oracle replicates
    the factor arithmetic (IEEE op order pinned as (coef*N)/n), the
    floor/threshold rule and the epoch expansion exactly (a=doc_id,
    b=epoch, c=n_epochs, d=repeat_factor).

    r7: the shard / bm25 / dsir / dsirtop arms moved to the dedicated
    retrieval_indexed row (q_retrieval_indexed) — this row carries the
    curation-SAMPLER surfaces only.

    part='divers' (r7): cluster-balanced diversity sampling
    (llm/curation.diversity_sample) through the explicit-centroid
    injection path — three hash-chosen cells (the embeddings of vec_id
    0/1/2), nearest-centroid assignment as a pure expression, and the
    per-cell quota draw (row_number over (hash_bucket, id), <= 30). The
    oracle replicates assignment (squared euclidean, ties to the lower
    cell), the hash order, and the quota cut (a=vec_id, b=cell)."""
    from .llm.curation import (chunk_documents, diversity_sample,
                               domain_reweight, mix_corpora,
                               pack_sequences, stratified_fixed_sample,
                               token_budget_sample)
    from .llm.decontam import contamination_report
    from .operators.sketches import kmv_estimate, kmv_partial
    docs = _t(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % 10 == 0)
    contaminated = contamination_report(docs, eval_df, "doc_id", "text", n=8) \
        .select("doc_id", F.lit(1).alias("is_cont"))
    mixed = mix_corpora(docs, "doc_id", "lang",
                        {"en": 1.0, "fr": 0.5, "de": 0.25, "es": 0.1})
    kmv = kmv_partial(mixed, ["lang"], "text", k=64, portable=True) \
        .select("lang", kmv_estimate("kmv", 64).alias("kmv_distinct_est"))
    mix_rows = (mixed.join(F.broadcast(contaminated), "doc_id", "left")
                .groupBy("lang").agg(
                    F.count(F.lit(1)).alias("a"),
                    F.sum("n_chars").cast("long").alias("b"),
                    F.sum(F.coalesce(F.col("is_cont"), F.lit(0)))
                     .cast("long").alias("c"))
                .join(kmv, "lang")
                .select(F.lit("mix").alias("part"), "lang", "a", "b", "c",
                        F.col("kmv_distinct_est").cast("double").alias("d")))
    _nulls = [F.lit(None).cast("long").alias("b"),
              F.lit(None).cast("long").alias("c"),
              F.lit(None).cast("double").alias("d")]
    strat_rows = stratified_fixed_sample(docs, "lang", "doc_id", 20).select(
        F.lit("strat").alias("part"), "lang",
        F.col("doc_id").cast("long").alias("a"), *_nulls)
    budget_rows = token_budget_sample(
        docs, "doc_id", "n_chars", group_col="lang",
        budgets={"en": 30000, "fr": 10000, "de": 10000, "es": 10000}).select(
        F.lit("budget").alias("part"), "lang",
        F.col("doc_id").cast("long").alias("a"), *_nulls)
    pack_rows = pack_sequences(docs, "doc_id", "n_chars", seq_len=2048,
                               group_col="lang").select(
        F.lit("pack").alias("part"), "lang",
        F.col("doc_id").cast("long").alias("a"),
        F.col("stream_offset").cast("long").alias("b"),
        F.col("last_seq").cast("long").alias("c"),
        F.col("first_seq").cast("double").alias("d"))
    chunk_rows = chunk_documents(docs, "doc_id", "text", chunk_tokens=32,
                                 overlap=8).select(
        F.lit("chunk").alias("part"),
        F.md5(F.col("chunk_text")).alias("lang"),
        F.col("doc_id").cast("long").alias("a"),
        F.col("chunk_id").cast("long").alias("b"),
        F.col("n_chunk_tokens").cast("long").alias("c"),
        F.lit(None).cast("double").alias("d"))
    repeat_rows = domain_reweight(docs, "doc_id", "lang", RW_SHARES,
                                  scale=RW_SCALE).select(
        F.lit("repeat").alias("part"), "lang",
        F.col("doc_id").cast("long").alias("a"),
        F.col("epoch").cast("long").alias("b"),
        F.col("n_epochs").cast("long").alias("c"),
        F.col("repeat_factor").cast("double").alias("d"))
    emb = _t(spark, sf_dir, "embeddings")
    dctr_rows = emb.where(F.col("vec_id") < 3).orderBy("vec_id").collect()
    dcents = [[float(x) for x in r["embedding"]] for r in dctr_rows]
    divers_rows = diversity_sample(emb, "vec_id", "embedding",
                                   per_cluster=30, centroids=dcents,
                                   keep_cluster_col=True).select(
        F.lit("divers").alias("part"),
        F.lit(None).cast("string").alias("lang"),
        F.col("vec_id").cast("long").alias("a"),
        F.col("_cell").cast("long").alias("b"),
        F.lit(None).cast("long").alias("c"),
        F.lit(None).cast("double").alias("d"))
    return (mix_rows.unionByName(strat_rows).unionByName(budget_rows)
            .unionByName(pack_rows).unionByName(chunk_rows)
            .unionByName(repeat_rows).unionByName(divers_rows))


def q_retrieval_indexed(spark, sf_dir):
    """Persisted-index retrieval + data-selection carrier (split out of
    corpus_mixture in r7 — VERDICT r6 flagged ten surfaces riding one
    hash; this row now owns the four index/selection arms, columns
    (part, lang, a, b, c, d) as before).

    part='shard': deterministic training-shard export
    (sources/shard_export.py) — documents written as 8 hash-assigned,
    rank-ordered parquet shards and READ BACK from disk, so the persisted
    layout (partitionBy dirs, rank-sorted files) is what produces the
    values; the oracle replicates shard = hash(id) mod 8 and the
    (hash, id) intra-shard row_number exactly (a=doc_id, b=shard,
    c=rank).

    part='bm25': BM25 top-5 retrieval through the PERSISTED inverted
    index (llm/retrieval.py) — built over the even-id half, odd half
    APPENDED as batch 1, so df/N/avgdl assembly across batch
    subdirectories and the shard-pruned probe are what produce the
    values. Quantized scoring mode (per-term 6dp -> DECIMAL(18,6) sum)
    makes scores exact and order-independent; the oracle replicates
    tokenize/postings/df/idf/score op-for-op (lang=query id, a=doc_id,
    b=rank, d=score).

    part='dsir': Data Selection via Importance Resampling (llm/dsir) —
    hashed unigram+bigram buckets (512, portable md5), Laplace-smoothed
    target(en)/raw log ratios rounded 6dp at the table, per-doc
    DECIMAL(18,6)-summed log weights. The oracle rebuilds the features,
    both corpus distributions, the smoothing arithmetic (explicit DOUBLE
    casts — DuckDB numeric literals are DECIMAL), ln at 6dp, and the
    exact decimal fold (a=doc_id, b=n_feats, d=log_weight).

    part='dsirtop': the full select-by-distribution-match path — Gumbel
    top-k WITHOUT replacement over exp(log_weight), noise from the id
    hash (u = (hash_bucket+0.5)/1e6, key = lw - ln(-ln(u))), quantize=6
    + id tie-break makes the selected SET engine-portable. The oracle
    replicates hash, Gumbel transform, 6-dp round, and ordering.

    part='pareto' (r7): GPT-3's quality re-sampling keep rule
    (llm/quality_classifier.pareto_keep_expr) — keep iff
    u^(-1/alpha) - 1 > 1 - score with u = (hash_bucket(id,42)+1)/1e6,
    alpha=9, over a deterministic score grid s = (doc_id % 100)/100.
    The oracle replicates hash, inverse-CDF Pareto draw, and the
    comparison; the kept id SET is the evidence (a=doc_id, d=score).

    part='rrf' (r7): HYBRID retrieval — Reciprocal Rank Fusion (Cormack
    et al. SIGIR'09, llm/retrieval.reciprocal_rank_fusion) of the BM25
    indexed top-5 (the part='bm25' ranking) with embedding-cosine brute
    top-5 over the same id space; the outer-join chain's fixed-order
    double additions and the (score desc, doc_id) re-rank are replicated
    op-for-op (lang=query id, a=doc_id, b=fused rank, d=rrf score).

    part='bm25s' (r9): the STREAMING ingest twin of part='bm25' —
    same even-id bootstrap (batch 0), odd half arriving through a REAL
    parquet file stream (1 file per micro-batch) via
    llm/retrieval.stream_bm25_index foreachBatch appends with
    batch_id_base=1 (the real-bootstrap clobber trap is IN the gate),
    probed through disk. Postings/df/N/avgdl assembly is per-batch
    either way, so the streamed index must produce the batch-append
    answer row for row; the oracle emits its bm25 replica under both
    labels. Closes the last streaming index writer with law-only
    evidence (stream_ivfpq_index was gated in the ivf_topk_indexed
    row earlier in r9)."""
    import tempfile

    from .llm.dsir import dsir_log_weights, dsir_sample
    from .llm.quality_classifier import pareto_quality_sample
    from .llm.retrieval import reciprocal_rank_fusion
    from .llm.similarity import brute_force_topk
    from .llm.retrieval import append_bm25_index, bm25_topk_indexed, \
        build_bm25_index
    from .sources.shard_export import export_shards, read_shards
    docs = _t(spark, sf_dir, "documents")
    shard_dir = tempfile.mkdtemp(prefix="shard_gate_")
    export_shards(docs, "doc_id", shard_dir, n_shards=8, token_col="n_chars")
    shard_rows = read_shards(spark, shard_dir).select(
        F.lit("shard").alias("part"), "lang",
        F.col("doc_id").cast("long").alias("a"),
        F.col("_shard").cast("long").alias("b"),
        F.col("_rank").cast("long").alias("c"),
        F.lit(None).cast("double").alias("d"))
    bq = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("qid"),
        F.substring("text", 1, 120).alias("qtext"))
    bp = tempfile.mkdtemp(prefix="bm25_gate_")
    build_bm25_index(docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text",
                     bp, n_shards=8, batch_id=0)
    # the streaming twin needs the IDENTICAL even-id bootstrap; the index
    # is plain files, so snapshot it now (one file copy) instead of paying
    # a second tokenize+postings build job (gate-cost shave)
    import shutil
    bs = tempfile.mkdtemp(prefix="bm25_stream_gate_")
    shutil.copytree(bp, bs, dirs_exist_ok=True)
    append_bm25_index(spark, bp, docs.where(F.col("doc_id") % 2 == 1),
                      "doc_id", "text", batch_id=1)
    bm_live = bm25_topk_indexed(spark, bp, bq, "qid", "qtext", k=5,
                                quantize=6)
    # snapshot the 15-row result driver-side (the text_quality rank_rows
    # pattern) instead of persisting: it feeds both the bm25 rows and the
    # RRF fusion, and a persist here would outlive the query (r7 review)
    bm = spark.createDataFrame(bm_live.collect(), bm_live.schema)
    bm25_rows = bm.select(
        F.lit("bm25").alias("part"),
        F.col("query_id").cast("string").alias("lang"),
        F.col("doc_id").cast("long").alias("a"),
        F.col("rank").cast("long").alias("b"),
        F.lit(None).cast("long").alias("c"),
        (F.col("score") + F.lit(0.0)).alias("d"))
    emb = _t(spark, sf_dir, "embeddings")
    ann = brute_force_topk(emb, emb.where(F.col("vec_id") < 3), "vec_id",
                           "embedding", k=5) \
        .select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    fused = reciprocal_rank_fusion(
        [bm.select("query_id", "doc_id", "rank"), ann], k=8, c=60)
    rrf_rows = fused.select(
        F.lit("rrf").alias("part"),
        F.col("query_id").cast("string").alias("lang"),
        F.col("doc_id").cast("long").alias("a"),
        F.col("rank").cast("long").alias("b"),
        F.lit(None).cast("long").alias("c"),
        (F.col("score") + F.lit(0.0)).alias("d"))
    dsw_live = dsir_log_weights(docs, docs.where(F.col("lang") == "en"),
                                "doc_id", "text", n_buckets=512, alpha=1.0,
                                portable=True)
    # one-doc-per-row weights table: bounded snapshot, shared by the dsir
    # rows and the Gumbel top-k without a leaked persist
    dsw = spark.createDataFrame(dsw_live.collect(), dsw_live.schema)
    dsir_rows = docs.select("doc_id", "lang").join(dsw, "doc_id").select(
        F.lit("dsir").alias("part"), "lang",
        F.col("doc_id").cast("long").alias("a"),
        F.col("n_feats").cast("long").alias("b"),
        F.lit(None).cast("long").alias("c"),
        (F.col("log_weight") + F.lit(0.0)).alias("d"))
    dsirtop_rows = dsir_sample(docs, None, "doc_id", "text", k=40,
                               seed=42, quantize=6, weights=dsw).select(
        F.lit("dsirtop").alias("part"), "lang",
        F.col("doc_id").cast("long").alias("a"),
        F.lit(None).cast("long").alias("b"),
        F.lit(None).cast("long").alias("c"),
        (F.col("log_weight") + F.lit(0.0)).alias("d"))
    scored = docs.select("doc_id", "lang",
                         ((F.col("doc_id") % 100) / F.lit(100.0))
                         .alias("q"))
    pareto_rows = pareto_quality_sample(scored, "doc_id", "q",
                                        alpha=9.0, seed=42).select(
        F.lit("pareto").alias("part"), "lang",
        F.col("doc_id").cast("long").alias("a"),
        F.lit(None).cast("long").alias("b"),
        F.lit(None).cast("long").alias("c"),
        (F.col("q") + F.lit(0.0)).alias("d"))
    # streamed twin of the bm25 arm: same bootstrap, odd half via a real
    # file stream with batch_id_base=1 (the non-empty-bootstrap trap)
    from .llm.retrieval import stream_bm25_index
    src = tempfile.mkdtemp(prefix="bm25_stream_src_")
    docs.where(F.col("doc_id") % 2 == 1).repartition(2) \
        .write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    sq = stream_bm25_index(stream, bs, "doc_id", "text",
                           checkpoint=tempfile.mkdtemp(prefix="bm25_ck_"),
                           batch_id_base=1)
    sq.awaitTermination()
    bm25s_rows = bm25_topk_indexed(spark, bs, bq, "qid", "qtext", k=5,
                                   quantize=6).select(
        F.lit("bm25s").alias("part"),
        F.col("query_id").cast("string").alias("lang"),
        F.col("doc_id").cast("long").alias("a"),
        F.col("rank").cast("long").alias("b"),
        F.lit(None).cast("long").alias("c"),
        (F.col("score") + F.lit(0.0)).alias("d"))
    # streamed twin of the dsir arm (r10 — the LAST index writer with
    # law-only evidence): even-id bucket-count partials bootstrap
    # batch=0, odd half arrives through a real parquet file stream via
    # llm/dsir.stream_dsir_counts with batch_id_base=1 (the clobber
    # trap, guarded in this writer since r10); the merged per-batch
    # partials re-assemble the one-shot raw distribution EXACTLY
    # (integer-count monoid), so the table built from them must produce
    # the dsir answer row for row — the oracle emits its dsir replica
    # under the 'dsirs' label too.
    from .llm.dsir import (dsir_count_partials, dsir_table_from_counts,
                           read_dsir_counts, stream_dsir_counts)
    dp = tempfile.mkdtemp(prefix="dsir_stream_gate_")
    dsir_count_partials(docs.where(F.col("doc_id") % 2 == 0), "text",
                        n_buckets=512, portable=True) \
        .write.mode("overwrite").parquet(f"{dp}/batch=0")
    dsrc = tempfile.mkdtemp(prefix="dsir_stream_src_")
    docs.where(F.col("doc_id") % 2 == 1).repartition(2) \
        .write.mode("overwrite").parquet(dsrc)
    dstream = spark.readStream.schema(docs.schema) \
        .option("maxFilesPerTrigger", 1).parquet(dsrc)
    dq = stream_dsir_counts(dstream, dp, "text", n_buckets=512,
                            portable=True,
                            checkpoint=tempfile.mkdtemp(prefix="dsir_ck_"),
                            batch_id_base=1)
    dq.awaitTermination()
    raw_counts = read_dsir_counts(spark, dp, n_buckets=512, portable=True)
    tgt_counts = dsir_count_partials(docs.where(F.col("lang") == "en"),
                                     "text", n_buckets=512, portable=True)
    stab = dsir_table_from_counts(raw_counts, tgt_counts, n_buckets=512,
                                  alpha=1.0)
    dsw_s = dsir_log_weights(docs, None, "doc_id", "text", n_buckets=512,
                             alpha=1.0, portable=True, table=stab)
    dsirs_rows = docs.select("doc_id", "lang").join(dsw_s, "doc_id").select(
        F.lit("dsirs").alias("part"), "lang",
        F.col("doc_id").cast("long").alias("a"),
        F.col("n_feats").cast("long").alias("b"),
        F.lit(None).cast("long").alias("c"),
        (F.col("log_weight") + F.lit(0.0)).alias("d"))
    return (shard_rows.unionByName(bm25_rows).unionByName(dsir_rows)
            .unionByName(dsirtop_rows).unionByName(pareto_rows)
            .unionByName(rrf_rows).unionByName(bm25s_rows)
            .unionByName(dsirs_rows))


def q_text_quality(spark, sf_dir):
    """text_metrics PLUS the WINNOWING fingerprint count (SIGMOD'03 MOSS,
    llm/textqual.winnow_fingerprints, portable md5 hash family) — the
    rolling-hash k-gram sweep, window minima, and distinct are replicated
    list-op-for-list-op in the oracle, gating the winnowing machinery.
    The bench keeps measuring the original metric set (runner override).

    r6 adds the WEB PREPROCESSING layer (llm/web.py): each document is
    wrapped in a deterministic HTML envelope (script/style/comment noise,
    a high-link-density nav div, entity-laden tail) and a deterministic
    messy URL — then extract/boilerplate/canonicalize run over them and
    the oracle replicates every regex, entity replace, block split,
    link-density division, and URL rewrite op-for-op: canon_url, url_dom,
    web_md5 (md5 of the boilerplate-removed text), n_blocks, n_kept."""
    from .llm import web as _web
    docs = _t(spark, sf_dir, "documents")
    base = textqual.text_metrics(docs, "doc_id", "text")
    fp = docs.select(
        "doc_id",
        F.size(textqual.winnow_fingerprints(F.col("text"), k=5, w=4,
                                            portable=True))
        .cast("long").alias("n_winnow_fp"))
    html = F.concat(F.lit(_WEB_HTML[0]), F.col("source"),
                    F.lit(_WEB_HTML[1]), F.col("text"),
                    F.lit(_WEB_HTML[2]), F.col("lang"),
                    F.lit(_WEB_HTML[3]), F.col("source"),
                    F.lit(_WEB_HTML[4]))
    url = F.concat(F.lit(_WEB_URL[0]), F.col("doc_id").cast("string"),
                   F.lit(_WEB_URL[1]), F.col("source"), F.lit(_WEB_URL[2]))
    # materialize the boilerplate struct ONCE per row (two stacked
    # projections, the text_metrics pattern): reading its three fields
    # off the expression directly re-ran the whole block-split machinery
    # per field — CollapseProject keeps the projections separate because
    # the alias is non-cheap and referenced three times
    wb = docs.withColumn("_boiler", _web.remove_boilerplate(html)) \
        .select(
            "doc_id",
            _web.canonicalize_url(url).alias("canon_url"),
            _web.url_domain(url).alias("url_dom"),
            F.md5(F.col("_boiler")["text"]).alias("web_md5"),
            F.col("_boiler")["n_blocks"].cast("long").alias("n_blocks"),
            F.col("_boiler")["n_kept"].cast("long").alias("n_kept"))

    # link graph (r6): extract_links over the same fixture -> host edges ->
    # 3 iterations of PORTABLE weighted PageRank (operators/graph.py —
    # contributions rounded 9dp and decimal-summed, so both engines land
    # on identical doubles); each doc carries its language hub's rank.
    # The hub/cdn hosts have no out-links, so the dangling-mass
    # redistribution path is part of the gate.
    from .operators.graph import pagerank
    links = _web.extract_links(html, url)
    ldf = docs.select("doc_id", url.alias("_u"),
                      F.explode(links).alias("_l"))
    edges = ldf.select(_web.url_host(F.col("_u")).alias("src"),
                       _web.url_host(F.col("_l.url")).alias("dst"))
    ranks = pagerank(edges, iterations=3, portable=True)
    # snapshot the ~26-node rank table driver-side (bounded collect, the
    # cms_df pattern) so the cache can be released without the lazy join
    # re-deriving the whole iteration chain at action time
    rank_rows = ranks.collect()
    ranks.unpersist()
    rank_df = spark.createDataFrame(rank_rows, "node string, rank double")
    lg = (docs.select("doc_id",
                      F.size(links).cast("long").alias("n_links"),
                      F.concat(F.lit("hub-"), F.col("lang"),
                               F.lit(".example.com")).alias("node"))
          .join(F.broadcast(rank_df), "node", "left")
          .select("doc_id", "n_links", F.col("rank").alias("hub_rank")))

    # HITS gate (r6): two PORTABLE power iterations over the REAL
    # source->lang affiliation graph (distinct pairs from the table — hub
    # scores vary by how many languages a source spans, authorities by
    # which sources carry the language). The oracle replicates both
    # normalized iterations — decimal contribution sums, the L2 norms'
    # sqrt, the divisions — IEEE-op-for-op; both engines must land on
    # identical doubles.
    from .operators.graph import hits
    hh = hits(docs.select(F.col("source").alias("src"),
                          F.col("lang").alias("dst")),
              iterations=2, portable=True)
    hh_rows = hh.collect()  # ~25 nodes — bounded snapshot, then release
    hh.unpersist()
    hh_df = spark.createDataFrame(
        hh_rows, "node string, hub double, authority double")
    hx = (docs.select("doc_id", "source", "lang")
          .join(F.broadcast(hh_df.select(F.col("node").alias("source"),
                                         F.col("hub").alias("src_hub"))),
                "source", "left")
          .join(F.broadcast(hh_df.select(F.col("node").alias("lang"),
                                         F.col("authority")
                                         .alias("lang_auth"))),
                "lang", "left")
          .select("doc_id", "src_hub", "lang_auth"))

    # WARC gate (r7): the ISO 28500 datasource round-trip. A hash-chosen
    # tenth of the documents (doc_id % 10 == 0 — volume adds no evidence,
    # split/parse coverage does; r9 halved the r7 fifth, the one
    # registry-form gate-cost shave left: parse is Python-side by design,
    # it's a custom-format datasource) is WRITTEN as WARC through the
    # distributed writer in BOTH layouts (plain .warc + per-record-gzip
    # .warc.gz, the CommonCrawl form), then READ BACK — ~30 KB byte-range
    # splits (r9) still force multiple splits per plain file, so the
    # boundary-scan resync path stays in the gate — and each payload is
    # re-hashed. Per
    # sampled doc: n_warc must be 2 (one record per layout), n_warc_md5
    # 1, warc_md5 == md5(text) iff every body survived byte-exact,
    # warc_status_sum == 400 (the HTTP response layer parsed on both
    # copies); unsampled docs carry NULLs through the left join. The
    # oracle computes the expected values from the table (DuckDB md5
    # hashes the same UTF-8 bytes).
    import tempfile

    from .sources.warc import read_warc, register_warc
    register_warc(spark)
    wrecs = docs.where(F.col("doc_id") % 10 == 0).select(
        F.lit("response").alias("warc_type"),
        F.concat(F.lit("https://warc.example.com/"),
                 F.col("doc_id").cast("string")).alias("target_uri"),
        F.lit(200).alias("http_status"),
        F.lit("text/plain").alias("http_content_type"),
        F.encode(F.col("text"), "UTF-8").alias("body")).repartition(2)
    wp = tempfile.mkdtemp(prefix="warc_gate_plain_")
    wg = tempfile.mkdtemp(prefix="warc_gate_gz_")
    wrecs.write.format("warc").option("path", wp) \
        .option("compression", "none").mode("overwrite").save()
    wrecs.write.format("warc").option("path", wg) \
        .option("compression", "gzip").mode("overwrite").save()
    rb = read_warc(spark, wp, split_mb=0.03) \
        .unionByName(read_warc(spark, wg))
    warc = (rb.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long")
        .alias("doc_id"),
        F.col("http_status").cast("long").alias("_st"),
        F.md5("body").alias("_bmd5"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_warc"),
             F.countDistinct("_bmd5").cast("long").alias("n_warc_md5"),
             F.min("_bmd5").alias("warc_md5"),
             F.sum("_st").cast("long").alias("warc_status_sum")))
    return (base.join(fp, "doc_id").join(wb, "doc_id").join(lg, "doc_id")
            .join(hx, "doc_id").join(warc, "doc_id", "left"))


# deterministic fixtures for the web-preprocessing gate: an HTML envelope
# (noise elements, nav div, entities — NO single quotes, so the same bytes
# inline into a DuckDB string literal) and a messy URL, both built from
# documents columns identically in Spark and SQL
_WEB_HTML = (
    '<html><head><title>Doc</title><script>if (1 < 2) alert("x");</script>'
    '<style>.n{color:red}</style></head><body><h1>',
    '</h1><p>',
    '</p><div><a href="/h">home page link</a> &middot; <a href="/a">about'
    '</a></div><p>&amp; &lt;raw&gt; &quot;quoted&quot; &nbsp;tail paragraph'
    '</p><!-- c --><ul><li><a href="HTTPS://Hub-',
    '.Example.COM:443/l?b=2&a=1">language hub page</a></li><li><a '
    "href='//cdn-",
    ".Example.NET/asset.js'>cdn asset link</a></li>"
    '<li><a href="/local/page">local page link</a></li>'
    '<li><a href="mailto:x@example.com">mail</a></li></ul></body></html>')
_WEB_URL = ("HTTPS://WWW.Example.CO.UK:443/docs/",
            "?utm_source=feed&fbclid=x&b=", "&a=1#f")


def _opq_gate_rotation(dim: int = 64) -> list[list[float]]:
    """Deterministic orthogonal rotation for the OPQ gate: the product of
    two Householder reflections built from fixed integer-pattern unit
    vectors (no RNG). Non-symmetric (H1·H2 != (H1·H2)ᵀ), so a transposed
    rotate_vector would fail the gate. The RESULT matrix is what both the
    Spark model and the DuckDB oracle consume — inlined as the same float
    literals on both sides — so the construction itself never has to be
    replicated cross-engine."""
    import numpy as np

    u1 = np.arange(1.0, dim + 1.0)
    u1 /= np.linalg.norm(u1)
    u2 = np.array([float((i * 37) % dim + 1) for i in range(dim)])
    u2 /= np.linalg.norm(u2)
    h1 = np.eye(dim) - 2.0 * np.outer(u1, u1)
    h2 = np.eye(dim) - 2.0 * np.outer(u2, u2)
    return [[float(x) for x in row] for row in (h1 @ h2)]


def q_similarity_topk(spark, sf_dir):
    """Brute-force cosine top-k AND IVF at full probe (n_probe == n_lists)
    AND scalar-quantized (SQ8) top-k:
    - IVF at full probe scans every cell, so the IVF plan — KMeans coarse
      quantizer, cell equi-join, per-query window — must land on EXACTLY the
      brute-force answer whatever the (seeded, float-order-dependent)
      centroids are. This oracle-gates the IVF machinery itself.
    - The SQ path is gated AT ITS OWN quantized answer: the oracle replicates
      the per-dimension min/max grid, round/clamp codes, and lo + code*step
      reconstruction in SQL (every step a single IEEE double op in matching
      order), so the compressed-corpus scoring — not just the exact math —
      is verified.
    - method='pq_adc' (r7): IVF-PQ (llm/similarity.ivf_pq_topk — Jégou
      et al. TPAMI 2011, residual product quantization + ADC LUT
      scoring) at its own quantized answer, through the explicit-model
      injection path: centroids = embeddings 0/1, per-subspace codebooks
      = the subvectors of embeddings 2..17 (a bounded 18-row collect),
      n_probe=1 so the CELL-PRUNED candidate join is in the gate, and
      quantize=6 so RANKS compare on the 6dp-rounded cosine (the ADC
      LUT computes dot(q, recon) by distributivity — a different IEEE
      association than the oracle's direct reconstruction cosine, so
      only the rounded value is cross-form stable; review r7 finding).
      The oracle replicates nearest-cell assignment, residual argmin
      codes (ties to the lowest code), centroid+codeword reconstruction,
      and the rounded-cosine ranking over each query's probed cell.
    - method='opq' (r8): OPQ (llm/similarity.opq_topk — Ge et al. CVPR
      2013) through the SAME explicit-model injection contract: the
      rotation is a deterministic two-Householder product
      (_opq_gate_rotation — identical float literals on both sides),
      codebooks reuse the embeddings-2..17 subvectors, the corpus is the
      even-id half (mirrored in SQL; bounds the O(d²) rotate cost at the
      gate), quantize=6 for cross-form rank stability. The oracle
      replicates rotate (R-column dot per output dim), flat-PQ argmin
      codes, codeword-only reconstruction, and the rounded rotated-space
      cosine ranking — closing the one law-only ANN tier from r7."""
    emb_live = _t(spark, sf_dir, "embeddings")
    # snapshot the embeddings table driver-side ONCE — five method arms
    # otherwise each rescan the parquet (r7 verdict: the gate-cost shave
    # pattern). The collect is CAPPED at the documented gate scale
    # (<= 2000 rows x 64 floats at sf0.1) so running the gate at a larger
    # SF degrades to an explicit error instead of an unbounded driver
    # collect (r8 advice).
    _EMB_SNAPSHOT_CAP = 4096
    _emb_rows = emb_live.limit(_EMB_SNAPSHOT_CAP + 1).collect()
    if len(_emb_rows) > _EMB_SNAPSHOT_CAP:
        raise ValueError(
            f"q_similarity_topk gate snapshot expects <= {_EMB_SNAPSHOT_CAP} "
            "embeddings (driver-side snapshot is a gate-scale shave); run "
            "the similarity operators directly at larger scales")
    emb = spark.createDataFrame(_emb_rows, emb_live.schema)
    q = emb.where(F.col("vec_id") < 20)
    # the 18 model-injection vectors come straight from the driver-side
    # snapshot (no Spark job) — they seed the pq/opq codebooks AND,
    # since r10, the IVF coarse centroids
    cvecs = [v for _, v in sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in _emb_rows if r["vec_id"] < 18)]
    brute = similarity.brute_force_topk(emb, q, "vec_id", "embedding", k=5) \
        .withColumn("method", F.lit("brute"))
    # injected centroids (embeddings 0..7): at FULL probe the answer
    # equals brute force whatever the centroids are — that is the point
    # of this arm — so the KMeans fit adds nothing to what the gate
    # gates; injecting kills the fit's ml jobs (~3-4 s of this gate's
    # wall time, the r9 verdict's similarity_topk shave) and exercises
    # the explicit-model contract at the coarse tier too
    ivf = similarity.ivf_topk(emb, q, "vec_id", "embedding", k=5,
                              n_lists=8, n_probe=8,
                              centroids=cvecs[:8]) \
        .withColumn("method", F.lit("ivf_full_probe"))
    sq = similarity.sq_topk(emb, q, "vec_id", "embedding", k=5, levels=256,
                            dim=64) \
        .withColumn("method", F.lit("sq_reconstructed"))
    pq_model = {"centroids": [cvecs[0], cvecs[1]],
                "codebooks": [[cvecs[2 + c][j * 8:(j + 1) * 8]
                               for c in range(16)] for j in range(8)]}
    pq = similarity.ivf_pq_topk(emb, q, "vec_id", "embedding", 64, k=5,
                                n_probe=1, m=8, model=pq_model,
                                quantize=6) \
        .withColumn("method", F.lit("pq_adc"))
    opq_model = {"rotation": _opq_gate_rotation(64),
                 "codebooks": pq_model["codebooks"],
                 "m": 8, "dsub": 8, "dim": 64}
    opq = similarity.opq_topk(emb.where(F.col("vec_id") % 2 == 0), q,
                              "vec_id", "embedding", 64, k=5, m=8,
                              model=opq_model, quantize=6) \
        .withColumn("method", F.lit("opq"))
    return (brute.unionAll(ivf).unionAll(sq).unionAll(pq).unionAll(opq)
            .select("method", "query_id", "neighbor_id", "rank",
                    (F.round(F.col("cosine"), 6) + F.lit(0.0))
                    .alias("cosine6")))


def q_sessionize(spark, sf_dir):
    """Sessionization, BOTH forms gated (r6): part='batch' is the
    window-lag/cumsum backfill operator (30-minute-gap sessions per user,
    rolled up per session); part='stream' runs the NATIVE
    F.session_window streaming aggregation (streaming/windows.py) over a
    real file stream with a 1-hour watermark, Trigger.AvailableNow,
    APPEND mode — so the oracle also replicates the state-expiry emission
    rule, pinned empirically at sf0.001 and sf0.01: a session emits iff
    session_end (last event + gap) < final watermark (max input event
    time - delay), strictly. Closes the last §2.13 surface without
    driver-row evidence."""
    from .streaming.stateful import session_stats_batch
    from .streaming.windows import (file_stream, run_to_memory,
                                    scaled_state_partitions,
                                    session_windowed_aggregate)
    ev = _t(spark, sf_dir, "events")
    batch = session_stats_batch(ev, "user_id", "ts", gap_minutes=30.0).select(
        F.lit("batch").alias("part"), F.col("key"),
        F.col("session_id").cast("long").alias("session_id"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("start_ms").cast("long").alias("start_ms"),
        F.col("end_ms").cast("long").alias("end_ms"),
        "total_value")
    stream = file_stream(spark, f"{sf_dir}/events.parquet", ts_col="ts")
    agg = session_windowed_aggregate(stream, "user_id", "ts",
                                     gap="30 minutes", watermark="1 hour")
    # state partitions sized from input bytes (r13; guide §2/§5) — the
    # session-window merge per key is partitioning-independent
    streamed = run_to_memory(
        agg, "append",
        state_partitions=scaled_state_partitions(
            spark, f"{sf_dir}/events.parquet")).select(
        F.lit("stream").alias("part"),
        F.col("user_id").cast("string").alias("key"),
        F.lit(None).cast("long").alias("session_id"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("session_start_ms").cast("long").alias("start_ms"),
        F.col("session_end_ms").cast("long").alias("end_ms"),
        "total_value")
    return batch.unionByName(streamed)


def q_streaming_window(spark, sf_dir):
    """Structured Streaming tumbling-window aggregation run to completion
    (Trigger.AvailableNow) — must equal the batch SQL on the same files."""
    from .streaming.windows import run_stream_available_now, windowed_event_aggregate
    return run_stream_available_now(
        spark, f"{sf_dir}/events.parquet", schema=None,
        transform=lambda s: windowed_event_aggregate(s, "ts", "1 day", "1 day"),
        ts_col="ts")


# ---------------------------------------------------------------------------
# round-4 extension surfaces, registry-gated (VERDICT r4 item 1)
# ---------------------------------------------------------------------------

def q_asof_join(spark, sf_dir):
    """Point-in-time (as-of) join, sources/asof.py: every purchase event
    picks up the latest preceding click event of the same user (backward
    direction). The oracle is DuckDB's NATIVE ``ASOF LEFT JOIN``. The right
    side is pre-aggregated to one row per (user, ts) so ties cannot make
    the matched payload ambiguous across engines."""
    from .sources.asof import asof_join
    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("l_event"),
        F.col("ts_ms").alias("l_ms"), F.col("value").alias("l_value"))
    right = (ev.where(F.col("event_type") == "click")
             .groupBy("user_id", F.col("ts_ms").alias("r_ms"))
             .agg(F.max("value").alias("r_value"))
             # the join consumes r_ms as the time axis; carry a payload
             # copy so the matched instant is part of the gated output
             .withColumn("r_matched_ms", F.col("r_ms")))
    out = asof_join(left, right, on="user_id", left_time="l_ms",
                    right_time="r_ms", direction="backward")
    return out.select(F.col("user_id").cast("long").alias("user_id"),
                      F.col("l_event").cast("long").alias("l_event"),
                      "l_ms", "l_value", "r_matched_ms", "r_value")


def q_cdc_scd2(spark, sf_dir):
    """CDC surfaces (sources/upsert.py) gated in one frame: SCD2 history ->
    point-in-time ``snapshot_at`` two version cutoffs (t1 = 2/5, t2 = 4/5
    of the max version — computed identically on both engines with integer
    div) -> ``snapshot_diff`` between them (I/U/D changelog). The events
    table is treated as a changelog: key = user_id, version = event_id,
    'error' rows are deletes. Oracle: latest-version-at-or-before-t window
    SQL + a full-outer-join diff replica."""
    from .sources.upsert import scd2_history, snapshot_at, snapshot_diff
    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        F.col("user_id").alias("k"), F.col("event_id").alias("ver"),
        "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"))
    max_ver = changes.agg(F.max("ver")).collect()[0][0]
    t1, t2 = max_ver * 2 // 5, max_ver * 4 // 5
    hist = scd2_history(changes, ["k"], "ver", op_col="op")
    s1 = snapshot_at(hist, t1)
    s2 = snapshot_at(hist, t2)

    def shape(df, part, op_col=None):
        return df.select(
            F.lit(part).alias("part"),
            F.col("k").cast("long").alias("k"),
            F.col("ver").cast("long").alias("ver"),
            F.col("value").cast("double").alias("value"),
            (F.col(op_col) if op_col else F.lit(None).cast("string"))
            .alias("op"))

    diff = snapshot_diff(s1, s2, ["k"], "ver")
    # part='pit': the BUCKETED point-in-interval join
    # (sources/range_join.point_in_interval_join) driven over the same
    # SCD2 intervals — every probe (k, t = event_id-1 for event_id % 7
    # == 0) must land on the version governing t (half-open intervals ->
    # end = valid_to - 1, far-future capped to the version space). Rows
    # carry the GOVERNING (ver, value); op holds the probe t as a string.
    from .sources.range_join import point_in_interval_join
    points = ev.where((F.col("event_id") % 7 == 0) & (F.col("event_id") > 0)) \
        .select(F.col("user_id").alias("k"),
                (F.col("event_id") - 1).alias("t"))
    intervals = hist.select(
        "k", F.col("ver").alias("g_ver"), F.col("value").alias("g_value"),
        "valid_from",
        (F.least(F.col("valid_to"), F.lit(max_ver + 1)) - 1).alias("vend"))
    pit = point_in_interval_join(points, intervals, "t", "valid_from",
                                 "vend", bucket_width=max(1, max_ver // 16),
                                 extra_keys=["k"], how="inner")
    pit_rows = pit.select(
        F.lit("pit").alias("part"), F.col("k").cast("long").alias("k"),
        F.col("g_ver").cast("long").alias("ver"),
        F.col("g_value").cast("double").alias("value"),
        F.col("t").cast("string").alias("op"))
    return shape(s1, "snap1").union(shape(s2, "snap2")) \
        .union(shape(diff, "diff", op_col="op")).union(pit_rows)


def q_top_k_by_group(spark, sf_dir):
    """Exact per-group top-k (util.top_k_by_group): 10 most active users
    per event type, min_count HAVING prefilter on, deterministic item-value
    tie-break. The shuffle carries one row per distinct (group, item)."""
    from .util import top_k_by_group
    ev = _t(spark, sf_dir, "events")
    out = top_k_by_group(ev, ["event_type"], "user_id", k=10, min_count=2)
    return out.select("event_type", F.col("user_id").cast("long").alias("user_id"),
                      "item_count", F.col("rank").cast("int").alias("rank"))


def q_rollup_partials(spark, sf_dir):
    """Incremental rollup maintenance (operators/rollup.py), the FULL
    persisted roundtrip: events split into two halves -> hourly carrier
    partials of each half WRITTEN TO PARQUET (decimal sums survive the file
    format) -> read back, merged to daily resolution, finalized. The
    monoid-carrier law makes this equal a direct single-pass daily rollup,
    which is exactly what the DuckDB oracle computes."""
    import tempfile

    from .operators.rollup import (rollup_finalize, rollup_merge,
                                   rollup_partials)
    stats = {"n": ("count", None), "total": ("sum_exact", "value"),
             "vmin": ("min", "value"), "vmax": ("max", "value"),
             "vmean": ("mean", "value")}
    hour, day = 3_600_000, 86_400_000
    ev = _t(spark, sf_dir, "events")
    halves = [ev.where(F.col("event_id") % 2 == 0),
              ev.where(F.col("event_id") % 2 == 1)]
    d = tempfile.mkdtemp(prefix="rollup_partials_gate_")
    for i, half in enumerate(halves):
        rollup_partials(half, "ts_ms", hour, ["event_type"], stats) \
            .write.mode("overwrite").parquet(f"{d}/half={i}")
    persisted = spark.read.parquet(f"{d}/half=0", f"{d}/half=1")
    merged = rollup_merge(persisted, day, ["event_type"], stats)
    out = rollup_finalize(merged, ["event_type"], stats)
    return out.select("bucket_start_ms", "event_type", "n",
                      F.col("total").cast("double").alias("total"),
                      "vmin", "vmax", "vmean")


def q_sketch_quantiles(spark, sf_dir):
    """Mergeable-sketch layer, oracle-gated at exact regimes:
    * part='kll': KLL quantiles (k=8192) per event type. With n per group
      <= k the sketch holds every value uncompacted, so get_quantile is
      EXACTLY the inclusive rank statistic the oracle computes (smallest
      value whose cumulative count/n >= q) — this gates the whole KLL
      aggregate/query path, not an approximation of it.
    * part='cms': CountMin (width 1000 x depth 5, seed 42) point-frequency
      estimates for each event type, decoded JVM-free
      (operators/sketches.CountMinSketch + serving/murmur3.py). With 5
      distinct strings in 1000 buckets there are no collisions, so the
      estimate equals the exact count the oracle computes — gating the
      sketch bytes, the murmur3 double hashing, and the decode.
    * part='freq' (r6): Misra-Gries frequent-items summaries — per-DAY
      partials parquet-persisted, read back, and merged to global (the
      daily-partials production shape). k=64 >= distinct event types at
      every stage, so the mergeable-summaries error bound collapses to 0
      and stored counts are exact; est is emitted ONLY under err == 0, so
      a nonzero bound (a broken merge) hash-fails rather than sliding by.
    * part='bloom' (r6): Bloom membership bitmap (4096 bits, k=3,
      portable md5 hash family) built over the distinct word BIGRAMS of
      even documents — as 4 sliced partials parquet-roundtripped and
      bit_or-MERGED (the per-shard production shape) — then probed with
      every document's bigrams AND their reversals (mostly non-members).
      est = might_contain; the oracle replicates the position hashes, the
      32-bit-word bitmap, and the all-k-bits membership rule op-for-op,
      so false positives must land on EXACTLY the same probes in both
      engines — gating the bit math itself, not just the no-false-negative
      direction."""
    import tempfile

    from .operators.sketches import (bloom_merge, bloom_partial, bloom_probe,
                                     cms_collect, freq_merge, freq_partial,
                                     kll_partial, kll_quantile)
    ev = _t(spark, sf_dir, "events")
    sk = kll_partial(ev, ["event_type"], "value", k=8192)
    kll = sk.select(
        F.lit("kll").alias("part"), "event_type",
        F.lit(None).cast("long").alias("est"),
        *[F.round(kll_quantile("kll", q), 6).alias(f"q{int(q * 100)}")
          for q in (0.25, 0.5, 0.75)])
    cms = cms_collect(ev, "event_type", eps=0.002, confidence=0.995, seed=42)
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    est_rows = [(t, cms.estimate(t)) for t in types]
    cms_df = spark.createDataFrame(est_rows, "event_type string, est long") \
        .select(F.lit("cms").alias("part"), "event_type", "est",
                *[F.lit(None).cast("double").alias(f"q{int(q * 100)}")
                  for q in (0.25, 0.5, 0.75)])
    fp = freq_partial(ev.select(F.to_date("ts").alias("_slice"), "event_type"),
                      ["_slice"], "event_type", k=64)
    d = tempfile.mkdtemp(prefix="freq_partials_gate_")
    fp.write.mode("overwrite").parquet(d)
    fm = freq_merge(spark.read.parquet(d).withColumn("_all", F.lit(1)),
                    ["_all"], k=64)
    freq = (fm.select("err", F.explode("items").alias("event_type", "_c"))
            .select(F.lit("freq").alias("part"), "event_type",
                    F.when(F.col("err") == 0, F.col("_c"))
                     .cast("long").alias("est"),
                    *[F.lit(None).cast("double").alias(f"q{int(q * 100)}")
                      for q in (0.25, 0.5, 0.75)]))

    docs = _t(spark, sf_dir, "documents")
    tkdf = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "),
                 lambda t: t != "").alias("tk"))

    def _bigrams(col, rev=False):
        seq = F.when(F.size(col) >= 2,
                     F.sequence(F.lit(1), F.size(col) - 1)) \
               .otherwise(F.array().cast("array<int>"))
        if rev:
            return F.transform(seq, lambda i: F.concat(
                F.element_at(col, i + 1), F.lit(" "), F.element_at(col, i)))
        return F.transform(seq, lambda i: F.concat(
            F.element_at(col, i), F.lit(" "), F.element_at(col, i + 1)))

    ins = (tkdf.where(F.col("doc_id") % 2 == 0)
           .select(F.explode(_bigrams(F.col("tk"))).alias("bg")).distinct())
    parts = bloom_partial(
        ins.withColumn("_slice", F.pmod(F.xxhash64("bg"), F.lit(4))),
        ["_slice"], "bg", 4096, 3, portable=True)
    bd = tempfile.mkdtemp(prefix="bloom_partials_gate_")
    parts.write.mode("overwrite").parquet(bd)
    bitmap = bloom_merge(
        spark.read.parquet(bd).withColumn("_g", F.lit(1)), ["_g"]).drop("_g")
    probes = (tkdf.select(F.explode(F.concat(
        _bigrams(F.col("tk")), _bigrams(F.col("tk"), rev=True))).alias("bg"))
        .distinct())
    bloom = (bloom_probe(probes, bitmap, "bg", 4096, 3, portable=True)
             .select(F.lit("bloom").alias("part"),
                     F.col("bg").alias("event_type"),
                     F.col("might_contain").cast("long").alias("est"),
                     *[F.lit(None).cast("double").alias(f"q{int(q * 100)}")
                       for q in (0.25, 0.5, 0.75)]))
    return kll.union(cms_df).union(freq).union(bloom)


def q_ivf_topk_indexed(spark, sf_dir):
    """PERSISTED ANN indexes, both tiers (part column):

    part='full': IVF index (llm/similarity.build_ivf_index) — corpus
    written partitioned by coarse-quantizer cell + centroid sidecar,
    queried at n_probe == n_lists. Full probe scans every cell, so the
    result must equal brute-force cosine top-k EXACTLY, whatever the
    seeded KMeans centroids are — the oracle is plain brute force. Gates
    the on-disk layout, sidecar roundtrip, and probed-cell read path
    (directory pruning itself is law-tested in tests/).

    part='pq' (r8): IVF-PQ index (build_ivfpq_index /
    append_ivfpq_index / ivfpq_topk_indexed) — the compressed-payload
    index tier — driven END-TO-END through disk with the similarity_topk
    gate's explicit quantizer model (centroids = embeddings 0/1,
    codebooks = embeddings-2..17 subvectors): build on even vec_ids
    (batch 0), APPEND odd (batch 1 — sidecar-model encode, no refit),
    probe at n_probe=1 / quantize=6. Encoding is per-row with an
    injected model, so the two-batch on-disk index must land on the
    same quantized answer as the one-shot in-memory ivf_pq_topk — the
    oracle is the same nearest-cell / residual-argmin / reconstruction
    replica as similarity_topk's pq_adc arm.

    part='stream' (r9): the STREAMING ingest path for the same index
    tier (llm/similarity.stream_ivfpq_index — the one ANN tier that was
    law-only in r8): build on evens (bootstrap batch 0), then the odd
    half arrives via a REAL parquet file stream (2 files, 1 per
    micro-batch) through foreachBatch sidecar-model appends with the
    default ``batch_id_base=1`` — the exact path where micro-batch 0
    would otherwise clobber the bootstrap's batch=0 directory (the r8
    trap) — then probed through disk. Assignment/encoding are per-row
    against the sidecar model, so the streamed index must land on the
    SAME rows as the batch-append 'pq' arm; the oracle emits the pq
    replica twice under both part labels."""
    import tempfile

    from .llm.similarity import (append_ivfpq_index, build_ivf_index,
                                 build_ivfpq_index, ivf_topk_indexed,
                                 ivfpq_topk_indexed, stream_ivfpq_index)
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    d = tempfile.mkdtemp(prefix="ivf_index_gate_")
    build_ivf_index(emb, "vec_id", "embedding", d, n_lists=8)
    full = ivf_topk_indexed(spark, d, q, "vec_id", "embedding", k=5,
                            n_probe=8)
    ctr_rows = emb.where(F.col("vec_id") < 18).orderBy("vec_id").collect()
    cvecs = [[float(x) for x in r["embedding"]] for r in ctr_rows]
    pq_model = {"centroids": [cvecs[0], cvecs[1]],
                "codebooks": [[cvecs[2 + c][j * 8:(j + 1) * 8]
                               for c in range(16)] for j in range(8)]}
    d2 = tempfile.mkdtemp(prefix="ivfpq_index_gate_")
    build_ivfpq_index(emb.where(F.col("vec_id") % 2 == 0), "vec_id",
                      "embedding", d2, 64, m=8, model=pq_model)
    append_ivfpq_index(spark, d2, emb.where(F.col("vec_id") % 2 == 1),
                       batch_id=1)
    pq = ivfpq_topk_indexed(spark, d2, q, "vec_id", "embedding", k=5,
                            n_probe=1, quantize=6)
    # streamed twin of the pq arm: same bootstrap, odd half via file stream
    d3 = tempfile.mkdtemp(prefix="ivfpq_index_stream_gate_")
    build_ivfpq_index(emb.where(F.col("vec_id") % 2 == 0), "vec_id",
                      "embedding", d3, 64, m=8, model=pq_model)
    src = tempfile.mkdtemp(prefix="ivfpq_stream_src_")
    emb.where(F.col("vec_id") % 2 == 1).repartition(2) \
        .write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(emb.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    sq = stream_ivfpq_index(stream, d3,
                            checkpoint=tempfile.mkdtemp(prefix="ivfpq_ck_"))
    sq.awaitTermination()
    streamed = ivfpq_topk_indexed(spark, d3, q, "vec_id", "embedding", k=5,
                                  n_probe=1, quantize=6)
    out = full.withColumn("part", F.lit("full")) \
        .unionAll(pq.withColumn("part", F.lit("pq"))) \
        .unionAll(streamed.withColumn("part", F.lit("stream")))
    return out.select(
        "part",
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("int").alias("rank"),
        (F.round(F.col("cosine"), 6) + F.lit(0.0)).alias("cosine6"))


def q_stream_stream_join(spark, sf_dir):
    """Stream-stream event-time interval join (streaming/windows.py) run to
    completion with Trigger.AvailableNow — LEFT OUTER: purchases joined to
    the same user's clicks within the following hour, BOTH sides real file
    streams with watermarks. Matched rows must equal the batch
    interval-join SQL; unmatched purchases emit NULL-joined rows exactly
    when the final global watermark passes their join upper bound
    (state-expiry semantics — the thing that bounds join state on an
    unbounded stream). The emission rule the oracle replicates, pinned
    empirically at sf0.001 AND sf0.01: global watermark = min(max event
    time per input AFTER its filter) - delay; a row emits iff
    l_ts + within < watermark, strictly."""
    from .streaming.windows import (file_stream, run_to_memory,
                                    scaled_state_partitions,
                                    stream_stream_interval_join)
    left = file_stream(spark, f"{sf_dir}/events.parquet", ts_col="ts") \
        .where(F.col("event_type") == "purchase") \
        .select(F.col("user_id").alias("l_user"),
                F.col("event_id").alias("l_event"), F.col("ts").alias("l_ts"))
    right = file_stream(spark, f"{sf_dir}/events.parquet", ts_col="ts") \
        .where(F.col("event_type") == "click") \
        .select(F.col("user_id").alias("r_user"),
                F.col("event_id").alias("r_event"), F.col("ts").alias("r_ts"))
    joined = stream_stream_interval_join(
        left, right, "l_user", "r_user", "l_ts", "r_ts",
        within="1 hour", watermark="2 hours", how="left_outer")
    # state partitions sized from input bytes (r13; guide §2/§5) — the
    # keyed interval join's matches/expiry are partitioning-independent
    return run_to_memory(
        joined, "append",
        state_partitions=scaled_state_partitions(
            spark, f"{sf_dir}/events.parquet")).select(
        F.col("l_user").cast("long").alias("l_user"),
        F.col("l_event").cast("long").alias("l_event"),
        F.col("r_event").cast("long").alias("r_event"))


# ---------------------------------------------------------------------------
# non-SQL-expressible (rows-only gate): hashing-based + ML + vectorizers
# ---------------------------------------------------------------------------

def q_text_ml_vectors(spark, sf_dir):
    """SmartTextVectorizer pivot-vs-hash decision + TF-IDF over document
    tokens in one per-doc frame (rows-only — seeded-hash vector outputs;
    merged so every registry entry fits the 50-query window)."""
    from .feature import from_dataframe
    from .operators.categorical import smart_text_vectorizer
    from .operators.text_ml import tfidf
    docs = _t(spark, sf_dir, "documents").withColumn(
        "toks", TX.tokenize(F.col("text")))
    feats = from_dataframe(docs, overrides={"source": "Text", "text": "TextArea",
                                            "toks": "TextList"})
    src_vec = smart_text_vectorizer(feats["source"], max_cardinality=2000,
                                    top_k=20, output_name="src_vec").fit(docs)
    txt_vec = smart_text_vectorizer(feats["text"], max_cardinality=30,
                                    hash_features=64, output_name="txt_vec").fit(docs)
    fitted_tfidf = tfidf(feats["toks"], num_features=64).fit(docs)
    out = fitted_tfidf.transform(docs).select("doc_id", "toks_tfidf",
                                              src_vec.expr(), txt_vec.expr())
    return out.select(
        "doc_id",
        F.size("src_vec").alias("src_vec_len"),
        F.size("txt_vec").alias("txt_vec_len"),
        F.lit(src_vec.params["strategy"]).alias("src_strategy"),
        F.lit(txt_vec.params["strategy"]).alias("txt_strategy"),
        F.size("toks_tfidf").alias("tfidf_dim"),
        F.round(F.aggregate(F.col("toks_tfidf"), F.lit(0.0),
                            lambda a, x: a + x), 4).alias("tfidf_sum"))


# trainable-charset gate fixture: per-class vowel-byte -> high-byte maps
# applied PAIRWISE on the hex of utf-8(p_name) (byte-aligned by
# construction; same transform in the oracle SQL). The three classes mimic
# windows-1252 / iso-8859-5 / koi8-r single-byte distributions.
_CS_CLASSES = ["windows-1252", "iso-8859-5", "koi8-r"]
_CS_MAPS = [
    {"61": "E4", "65": "E9", "69": "EF", "6F": "F6", "75": "FC"},
    {"61": "D0", "65": "D5", "69": "D8", "6F": "DE", "75": "E3"},
    {"61": "C1", "65": "C5", "69": "C9", "6F": "CF", "75": "D5"},
]


# media-content gate fixtures (r10): real BMP/WAV headers as hex — a
# 9x8 24bpp BMP (54-byte header, 28-byte stride, 224 data bytes) in
# bottom-up (+8) and top-down (-8) height variants, and a canonical
# 44-byte mono PCM16 WAV with 128 samples (256 data bytes). Data bytes
# come from p_partkey formulas shared with the oracle.
_BMP_HDR_POS = ("424D" "16010000" "00000000" "36000000"   # BM, size, rsvd, off=54
                "28000000" "09000000" "08000000"          # dib=40, w=9, h=+8
                "0100" "1800" + "0" * 48)                 # planes, bpp=24, rest 0
_BMP_HDR_NEG = ("424D" "16010000" "00000000" "36000000"
                "28000000" "09000000" "F8FFFFFF"          # h=-8 (top-down)
                "0100" "1800" + "0" * 48)
_WAV_HDR = ("524946462401000057415645666D74201000000001000100401F0000"
            "803E0000020010006461746100010000")


def q_mime_detector(spark, sf_dir):
    """MIME magic-byte sniffing over synthesized base64 content (the oracle
    rebuilds the payload bytes and applies the same magic-prefix rules).

    r8 adds the TRAINABLE CHARSET column (operators/charset_nb — the
    Tika/ICU4J single-byte n-gram model family of
    MimeTypeDetector.scala:49, trained not shipped): a labeled
    single-byte corpus is synthesized by mapping vowel bytes of
    utf-8(p_name) to per-class high bytes (pairwise on hex — the oracle
    applies the identical transform), the byte-bigram NB is FIT in
    portable mode on p_partkey < 400, and every payload is classified as
    pure expressions. The rule path answers windows-1252 for ALL of
    these (non-UTF-8 high bytes — the blanket this model replaces); the
    oracle replicates the whole train-then-classify path in SQL."""
    from .operators.categorical import detect_mime_type
    from .operators.charset_nb import (charset_nb_label,
                                       train_charset_classifier)
    p = _t(spark, sf_dir, "part")
    payload = F.when(F.col("p_partkey") % 3 == 0,
                     F.concat(F.unhex(F.lit("89504E470D0A1A0A")), F.encode(F.col("p_name"), "UTF-8"))) \
        .when(F.col("p_partkey") % 3 == 1,
              F.concat(F.unhex(F.lit("FFD8FFE0")), F.encode(F.col("p_name"), "UTF-8"))) \
        .otherwise(F.encode(F.col("p_name"), "UTF-8"))
    b64 = F.base64(payload)

    hx = F.hex(F.encode(F.col("p_name"), "UTF-8"))
    cls = (F.col("p_partkey") % 3).cast("int")

    def map_pair(pair):
        out = pair
        for ci in range(2, -1, -1):
            branch = pair
            for k, v in sorted(_CS_MAPS[ci].items()):
                branch = F.when(pair == k, F.lit(v)).otherwise(branch)
            out = F.when(cls == ci, branch).otherwise(out)
        return out

    mapped = F.transform(
        F.sequence(F.lit(1), (F.length(hx) / 2).cast("int")),
        lambda i: map_pair(F.substr(hx, i * 2 - 1, F.lit(2))))
    cs_payload = F.unhex(F.concat_ws("", mapped))
    enc_label = F.element_at(F.array(*[F.lit(x) for x in _CS_CLASSES]),
                             cls + 1)
    # r10 media-CONTENT arms: a real 9x8 24-bit BMP (bottom-up for
    # even keys, top-down negative-height for odd) and a canonical
    # 128-sample PCM16 mono WAV are synthesized per part row from
    # p_partkey byte formulas, and the DECODE-FREE content operators
    # (llm/multimodal.bmp_dhash / wav_energy_sig — fixed-arithmetic
    # byte probes, no image/audio libs) run over the actual blobs; the
    # oracle computes the expected 64-bit signatures directly from the
    # same byte formulas (grid sampling, row order, thermometer
    # thresholds replicated in integer SQL).
    from .llm.multimodal import bmp_dhash, wav_energy_sig
    pk = F.col("p_partkey")
    bmp_data_hex = F.concat_ws("", F.transform(
        F.sequence(F.lit(0), F.lit(223)),
        lambda i: F.lpad(F.hex((pk * 7 + i * 13) % 256), 2, "0")))
    bmp_blob = F.unhex(F.concat(
        F.when(pk % 2 == 0, F.lit(_BMP_HDR_POS))
        .otherwise(F.lit(_BMP_HDR_NEG)), bmp_data_hex))
    wav_data_hex = F.concat_ws("", F.transform(
        F.sequence(F.lit(0), F.lit(127)),
        lambda k: F.concat(
            F.lpad(F.hex(((pk * 31 + k * 37) % 65536) % 256), 2, "0"),
            F.lpad(F.hex(F.shiftright(
                ((pk * 31 + k * 37) % 65536).cast("long"), 8)), 2,
                "0"))))
    wav_blob = F.unhex(F.concat(F.lit(_WAV_HDR), wav_data_hex))
    base = p.select("p_partkey", b64.alias("b64"),
                    cs_payload.alias("cs_payload"),
                    enc_label.alias("enc"),
                    bmp_blob.alias("bmp_blob"),
                    wav_blob.alias("wav_blob"))
    m = train_charset_classifier(base.where(F.col("p_partkey") < 400),
                                 "cs_payload", "enc", max_vocab=300,
                                 portable=True)
    return base.select(
        "p_partkey", detect_mime_type(F.col("b64")).alias("mime"),
        F.col("enc").alias("charset_label"),
        charset_nb_label(F.col("cs_payload"), m).alias("charset_pred"),
        bmp_dhash(F.col("bmp_blob")).alias("bmp_hash"),
        wav_energy_sig(F.col("wav_blob")).alias("wav_sig"))


def q_model_selection(spark, sf_dir):
    """BinaryClassificationModelSelector: k-fold CV leaderboard (rows-only —
    ml fits)."""
    from pyspark.ml.functions import array_to_vector
    from .ml.selectors import default_binary_candidates, select_binary_model
    o = _t(spark, sf_dir, "orders")
    data = o.select(
        "o_orderkey",
        array_to_vector(F.array(
            (F.col("o_totalprice") / 1e6),
            F.month(F.col("o_orderdate")).cast("double") / 12.0,
        )).alias("fv"),
        (F.col("o_orderstatus") == "F").cast("double").alias("label"))
    sel = select_binary_model(data, "fv", "label", "o_orderkey",
                              candidates=default_binary_candidates(small=True), k=3)
    rows = [(c.name, str(c.params), float(c.metric)) for c in sel.leaderboard]
    return spark.createDataFrame(rows, "model string, params string, cv_auroc double")


def q_loco_insights(spark, sf_dir):
    """RecordInsightsLOCO, HARD-GATED (r6 — was rows-only): a 2-feature
    linear model is fit by CLOSED-FORM OLS whose normal equations are
    computed over EXACT integer aggregates (cents + month + 0/1 label;
    Python bigint on the Spark side, HUGEINT in the oracle), so both
    engines derive bit-identical double coefficients; the per-record LOCO
    deltas then flow through the real loco_linear operator
    (ml/insights.py, link='identity' — delta_i reduces to w_i*x_i, the
    RecordInsightsLOCO.scala:100 linear closed form) and the oracle
    replicates margin/delta/top-slot selection IEEE-op-for-op. The
    sigmoid form stays law-tested (loco_any_model == loco_linear,
    tests/test_ml.py). One 1-row driver collect (the 9 OLS sums) —
    bounded at any scale."""
    from .ml.insights import loco_linear
    o = _t(spark, sf_dir, "orders")
    data = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c1"),
        F.month(F.col("o_orderdate")).cast("long").alias("m"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"))
    g = data.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c1").alias("s1"), F.sum("m").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum((F.col("c1") * F.col("c1")).cast("decimal(38,0)")).alias("s11"),
        F.sum(F.col("c1") * F.col("m")).alias("s12"),
        F.sum(F.col("c1") * F.col("y")).alias("s1y"),
        F.sum(F.col("m") * F.col("m")).alias("s22"),
        F.sum(F.col("m") * F.col("y")).alias("s2y")).first()
    n, s1, s2, sy = (int(g["n"]), int(g["s1"]), int(g["s2"]), int(g["sy"]))
    s11, s12, s1y = int(g["s11"]), int(g["s12"]), int(g["s1y"])
    s22, s2y = int(g["s22"]), int(g["s2y"])
    # exact-integer normal equations (Python bigints — no rounding until
    # the final double divisions, which the oracle mirrors op-for-op)
    c11, c12, c22 = n * s11 - s1 * s1, n * s12 - s1 * s2, n * s22 - s2 * s2
    c1y, c2y = n * s1y - s1 * sy, n * s2y - s2 * sy
    det = c11 * c22 - c12 * c12
    b1 = float(c22 * c1y - c12 * c2y) / float(det)
    b2 = float(c11 * c2y - c12 * c1y) / float(det)
    b0 = (float(sy) - b1 * float(s1) - b2 * float(s2)) / float(n)
    arr = data.withColumn(
        "arr", F.array(F.col("c1").cast("double"), F.col("m").cast("double")))
    out = loco_linear(arr, "arr", b0, [b1, b2], top_k=2, link="identity")
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        (F.round(F.col("base_score"), 6) + F.lit(0.0)).alias("score6"),
        F.col("loco")[0]["slot"].cast("int").alias("top_slot"),
        (F.round(F.col("loco")[0]["delta"], 6) + F.lit(0.0)).alias("top_delta6"))


def q_embedding_near_dup(spark, sf_dir):
    """Embedding near-dup carrier (merged r7, columns part/a/b/d).

    part='lsh': cosine near-dup pairs via hyperplane-LSH buckets (the
    scale path: bucket equi-join, never all-pairs; portable "signs"
    planes so the oracle reproduces the buckets exactly); a=id1, b=id2
    (id1<id2), d=cosine rounded 6dp.

    part='semclu' / 'semkeep' (r7): SemDeDup (Abbas et al. 2023,
    llm/dedup.semantic_dedup) oracle-gated end to end in its PORTABLE
    form — explicit hash-chosen centroids (the embeddings of vec_id 0
    and 1; a bounded 2-row collect), so cell assignment is the pure
    nearest-centroid expression, within-cell cosine pairs at eps=0.35,
    connected components (min reachable id), and the paper's 'edge'
    survivor rule under quantize=6 (lowest 6dp centroid-cosine, ties min
    id). The oracle replicates assignment, pair mining, a recursive-CTE
    transitive closure, and the survivor ranking: semclu rows carry
    every clustered doc (a=doc, b=cluster_id, d=centroid_sim 6dp);
    semkeep rows carry the surviving ids (dup-group reps + untouched
    docs). r8 shave: the kept-set derives from the same pairs/CC frames
    as semclu, and the survivor pass runs on the id column only (the
    vectors play no role in the keep rule)."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_near_dup_pairs_lsh(emb, "vec_id", "embedding",
                                               dim=64, threshold=0.35)
    lsh_rows = pairs.select(
        F.lit("lsh").alias("part"),
        F.col("id1").cast("long").alias("a"),
        F.col("id2").cast("long").alias("b"),
        (F.round(F.col("cosine"), 6) + F.lit(0.0)).alias("d"))
    ctr_rows = emb.where(F.col("vec_id") < 2).orderBy("vec_id").collect()
    centroids = [[float(x) for x in r["embedding"]] for r in ctr_rows]
    spairs, assigned = dedup.semantic_dedup_pairs(
        emb, "vec_id", "embedding", eps=0.35, centroids=centroids)
    clusters = dedup.duplicate_clusters(spairs)
    semclu_rows = (clusters
                   .join(assigned.select(F.col("id").alias("doc"),
                                         "centroid_sim"), "doc")
                   .select(F.lit("semclu").alias("part"),
                           F.col("doc").cast("long").alias("a"),
                           F.col("cluster_id").cast("long").alias("b"),
                           (F.round("centroid_sim", 6) + F.lit(0.0))
                           .alias("d")))
    # r8 gate-cost shave: derive the kept-set from the SAME pairs/CC/
    # assignment frames the semclu rows use instead of letting
    # semantic_dedup recompute the whole mine+CC pipeline
    kept = dedup.semantic_dedup_keep(emb.select("vec_id"), "vec_id",
                                     clusters, assigned, keep="edge",
                                     quantize=6)
    semkeep_rows = kept.select(
        F.lit("semkeep").alias("part"),
        F.col("vec_id").cast("long").alias("a"),
        F.lit(None).cast("long").alias("b"),
        F.lit(None).cast("double").alias("d"))
    # part='pool' (r9): text -> embedding ingestion gated end to end —
    # embed_documents in its PORTABLE decimal-mean form over a word-
    # vector table computed from the corpus vocabulary by pure char-code
    # arithmetic (both engines derive the SAME vectors from the words
    # themselves — no file, no collect); rows: a=doc_id, b=dimension,
    # d=float32 component back-cast to double. Gates the tokenize ->
    # vocab join -> per-position decimal mean -> float cast pipeline
    # (llm/embeddings.embed_documents portable=True).
    from .llm.embeddings import embed_documents
    from .llm.textqual import TOKEN_PATTERN
    docs = _t(spark, sf_dir, "documents")
    vocab = docs.select(F.explode(F.regexp_extract_all(
        F.lower("text"), F.lit(f"({TOKEN_PATTERN})"), 1)).alias("word")) \
        .distinct()

    def _comp(i: int):
        ch = F.substring(F.col("word"),
                         (F.pmod(F.lit(i), F.length("word")) + 1)
                         .cast("int"), 1)
        return ((F.ascii(ch) * F.lit(i + 3)) % 100).cast("double") \
            / F.lit(100.0) - F.lit(0.5)

    vecs = vocab.select("word", F.array(*[_comp(i) for i in range(8)])
                        .alias("vec"))
    pooled = embed_documents(docs, "text", vecs, id_col="doc_id",
                             portable=True)
    pool_rows = pooled.where(F.col("embedding").isNotNull()).select(
        F.lit("pool").alias("part"),
        F.col("doc_id").cast("long").alias("a"),
        F.posexplode("embedding").alias("_p", "_v")) \
        .select("part", "a", (F.col("_p")).cast("long").alias("b"),
                F.col("_v").cast("double").alias("d"))
    return lsh_rows.unionByName(semclu_rows).unionByName(semkeep_rows) \
        .unionByName(pool_rows)


def q_dedup_simhash(spark, sf_dir):
    """SimHash duplicate groups, portable md5-bit mode (part='group' —
    the DuckDB oracle recomputes every 64-bit signature from token md5
    digests) PLUS the persisted incremental SimHash index driven
    end-to-end (part='incremental', r6): build_simhash_index over the
    even-id half, shard-pruned simhash_dedup_incremental probes (even
    half self-probe; odd half cross + within-batch), hamming <= 3 pairs
    verified by exact bit_count. Merged-carrier columns (part, a, b, c):
    group rows carry (simhash, representative, dup_count); incremental
    rows carry (id1, id2, hamming)."""
    import tempfile
    docs = _t(spark, sf_dir, "documents")
    groups = dedup.simhash_groups(docs, "doc_id", "text", portable=True) \
        .select(F.lit("group").alias("part"),
                F.col("simhash").alias("a"),
                F.col("representative").cast("long").alias("b"),
                F.col("dup_count").cast("long").alias("c"))
    p = tempfile.mkdtemp(prefix="simhash_index_gate_")
    a_df = docs.where(F.col("doc_id") % 2 == 0)
    b_df = docs.where(F.col("doc_id") % 2 == 1)
    dedup.build_simhash_index(a_df, "doc_id", "text", p, portable=True,
                              n_shards=16, batch_id=0)
    a_pairs = dedup.simhash_dedup_incremental(spark, p, a_df, "doc_id",
                                              "text", within_batch=False)
    b_pairs = dedup.simhash_dedup_incremental(spark, p, b_df, "doc_id",
                                              "text", within_batch=True)
    incr = (a_pairs.unionByName(b_pairs)
            .select(F.least("id1", "id2").cast("long").alias("a"),
                    F.greatest("id1", "id2").cast("long").alias("b"),
                    F.col("hamming").cast("long").alias("c"))
            .distinct()
            .select(F.lit("incremental").alias("part"), "a", "b", "c"))
    return groups.unionByName(incr)


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH candidate pairs, portable mode: signatures and band
    buckets from md5 hex prefixes so the oracle replicates the banded plan
    (llm/dedup.py portable_hash64 formula). part='full' is the one-shot
    run; part='incremental' (r6) drives the PERSISTED index machinery —
    build_lsh_index over the even-id half, then shard-pruned
    lsh_dedup_incremental probes (even half self-probe for within-corpus
    pairs; odd half for cross + within-batch pairs). Since a doc's banded
    buckets depend only on its own text, the canonicalized union must
    hash-equal the one-shot candidate set — same SQL, gating the on-disk
    layout, sidecar roundtrip, and probe path with hard values.

    Signature sharing (r6): the one-shot run and the index BUILD share one
    persisted ``minhash_signatures`` frame (the portable-md5 signature scan
    dominates this gate's cost; computing it once per plan family is the
    production shape). The two PROBES still construct their signatures in
    fresh plans — index written by plan 1, probed by plan 2 — so the
    cross-plan hash-family consistency that caught the r6 seed-binding bug
    remains under test.

    part='stream' (r10 — the LAST law-only streaming index writer
    driver-gated): the even-id index build is snapshotted (file copy)
    before anything else touches it, the odd half arrives through a
    REAL parquet file stream via llm/dedup.stream_lsh_index foreachBatch
    appends with batch_id_base=1 (the clobber trap in the gate, the
    ivf/bm25 recipe), and ONE probe of every document against the
    streamed index must reproduce the one-shot candidate set exactly —
    banded rows depend only on each document's own text, so the
    bootstrap + streamed batches reassemble the full index regardless
    of batch boundaries. The oracle emits its pair replica under the
    'stream' label too."""
    import shutil
    import tempfile
    docs = _t(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", n=3,
                                    num_hashes=16, portable=True).persist()
    full = dedup.minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=16, bands=4, portable=True,
        signatures=sigs) \
        .select(F.lit("full").alias("part"),
                F.col("id1").cast("long").alias("id1"),
                F.col("id2").cast("long").alias("id2"))
    p = tempfile.mkdtemp(prefix="lsh_index_gate_")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    dedup.build_lsh_index(a, "doc_id", "text", p, n=3, num_hashes=16,
                          bands=4, portable=True, n_shards=16, batch_id=0,
                          signatures=sigs.where(F.col("id") % 2 == 0))
    # snapshot the even-id bootstrap for the streaming twin NOW (one
    # file copy — the bm25s gate-cost shave) before the probes below
    ps = tempfile.mkdtemp(prefix="lsh_stream_gate_")
    shutil.copytree(p, ps, dirs_exist_ok=True)
    a_pairs = dedup.lsh_dedup_incremental(spark, p, a, "doc_id", "text",
                                          within_batch=False)
    b_pairs = dedup.lsh_dedup_incremental(spark, p, b, "doc_id", "text",
                                          within_batch=True)
    incr = (a_pairs.unionByName(b_pairs)
            .select(F.least("id1", "id2").cast("long").alias("id1"),
                    F.greatest("id1", "id2").cast("long").alias("id2"))
            .distinct()
            .select(F.lit("incremental").alias("part"), "id1", "id2"))
    # streamed twin: odd half through a real file stream appending to
    # the bootstrap snapshot; one all-docs probe (shared signatures)
    # must equal the one-shot candidate set
    src = tempfile.mkdtemp(prefix="lsh_stream_src_")
    # one stream file = one micro-batch: the base-offset + append path
    # is fully exercised by bootstrap(0) + streamed batch(1), and each
    # extra micro-batch costs a full banding-plan compile (gate budget)
    b.repartition(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    sq = dedup.stream_lsh_index(
        stream, ps, "doc_id", "text",
        checkpoint=tempfile.mkdtemp(prefix="lsh_ck_"), batch_id_base=1)
    sq.awaitTermination()
    s_pairs = dedup.lsh_dedup_incremental(
        spark, ps, docs, "doc_id", "text", within_batch=False,
        signatures=sigs,
        signature_params={"n": 3, "num_hashes": 16, "portable": True})
    streamed = (s_pairs
                .select(F.least("id1", "id2").cast("long").alias("id1"),
                        F.greatest("id1", "id2").cast("long").alias("id2"))
                .distinct()
                .select(F.lit("stream").alias("part"), "id1", "id2"))
    return full.unionByName(incr).unionByName(streamed)


def q_similarity_ann_lsh(spark, sf_dir):
    """Hyperplane-LSH ANN top-k with the portable ±1 "signs" plane family
    (fixed-point dots -> fold-order-independent bucket bits).

    part='base': single-bucket probe. part='probe1' (r8): MULTI-PROBE —
    each query also probes the hamming-1 bucket with plane bit 0 flipped
    (n_flip=1); the oracle replicates the probe expansion as a UNION of
    (bucket, xor(bucket, 1)) on the query side of the SAME equi-join."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    base = similarity.hyperplane_lsh_topk(emb, q, "vec_id", "embedding",
                                          dim=64, k=5, planes="signs")
    probe = similarity.hyperplane_lsh_topk(emb, q, "vec_id", "embedding",
                                           dim=64, k=5, planes="signs",
                                           n_flip=1)
    out = base.withColumn("part", F.lit("base")) \
        .unionAll(probe.withColumn("part", F.lit("probe1")))
    return out.select("part", "query_id", "neighbor_id", "rank",
                      (F.round(F.col("cosine"), 6) + F.lit(0.0)).alias("cosine6"))


def q_transmogrify_vector(spark, sf_dir):
    """transmogrify() auto-vectorization over mixed types, exploded to
    (key, slot, value) rows so the oracle verifies EVERY slot value: the
    one-hot layout (count desc / value asc order, min_support, OTHER + null
    slots) and the mean-filled real slots."""
    from .feature import from_dataframe
    from .operators.vectorizers import transmogrify
    from .workflow import Workflow
    cust = _t(spark, sf_dir, "customer")
    feats = from_dataframe(cust, overrides={"c_mktsegment": "PickList",
                                            "c_acctbal": "Currency"})
    vec = transmogrify([feats["c_mktsegment"], feats["c_acctbal"]], top_k=5, min_support=5)
    model = Workflow([vec]).fit(cust)
    out = model.score(cust, keep_intermediate=True)
    return out.select("c_custkey",
                      F.posexplode(F.col("features")).alias("slot", "value"))


def q_sanity_checker(spark, sf_dir):
    """SanityChecker: leakage slot removal — returns kept-slot count per row
    (rows-only; the leaky slot must be gone)."""
    from .feature import from_dataframe
    from .operators.preparators import sanity_checker
    from .operators.vectorizers import transmogrify
    from .workflow import Workflow
    cust = _t(spark, sf_dir, "customer")
    df = cust.withColumn("label", (F.col("c_acctbal") > 5000).cast("double"))
    feats = from_dataframe(df, overrides={"c_mktsegment": "PickList"})
    vec = transmogrify([feats["c_mktsegment"], feats["c_acctbal"]], top_k=5, min_support=5)
    checked = sanity_checker(vec, feats["label"], max_correlation=0.9)
    model = Workflow([checked.output]).fit(df)
    out = model.score(df, keep_intermediate=True)
    return out.select("c_custkey", F.size(F.col(checked.output.name)).alias("n_slots_kept"))


def q_ml_train_score(spark, sf_dir, timings=None):
    """Full spine: joined+aggregated reader -> transmogrify -> LR on a
    deterministic hash-split train set -> per-split quality metrics
    (OpWorkflow.train + score + evaluate re-expressed).

    No SQL oracle (seeded LBFGS), but the OUTPUT is deterministic and
    comparable across rounds: per split n / n_pos / n_correct are integers
    and AuROC uses the integer Mann-Whitney numerator (ml/evaluators.py),
    rounded to 4dp only at the end.

    ``timings`` (bench-only): pass a dict to get per-phase wall seconds
    (reader / transmogrify_fit / lr_fit — the driver never passes it, so
    the gated plan is unchanged). Phase attribution forces the reader once,
    which the un-instrumented plan doesn't do — phase numbers explain where
    time goes; the headline timing stays the plain run."""
    import time as _time

    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import vector_to_array
    from .feature import from_dataframe
    from .operators.vectorizers import to_ml_vector, transmogrify_batched
    from .workflow import Workflow

    _t0 = _time.time()

    def _mark(name):
        nonlocal _t0
        if timings is not None:
            timings[name] = round(_time.time() - _t0, 3)
            _t0 = _time.time()

    jr = JoinedReader(left=DataReader(path=f"{sf_dir}/customer.parquet"),
                      right=DataReader(path=f"{sf_dir}/orders.parquet"),
                      left_key="c_custkey", right_key="o_custkey", join_type="left")
    ja = JoinedAggregateReader(
        joined=jr, key_col="c_custkey",
        specs=[
            AggSpec("n_orders", "case when o_orderkey is not null then 1 end", "sum"),
            AggSpec("total_spend", "o_totalprice", "sum_exact"),
            AggSpec("mkt", "c_mktsegment", "max"),
            AggSpec("acctbal", "c_acctbal", "max"),
            AggSpec("label_raw", "o_orderstatus = 'F'", "logical_or", is_response=True),
        ])
    base = ja.generate(spark).withColumn(
        "label", F.coalesce(F.col("label_raw").cast("double"), F.lit(0.0)))
    if timings is not None:
        base = base.persist()
        base.count()
    _mark("reader")
    feats = from_dataframe(base, response="label",
                           overrides={"mkt": "PickList", "total_spend": "Currency",
                                      "acctbal": "Currency", "n_orders": "Integral"})
    vec = transmogrify_batched([feats["mkt"], feats["total_spend"],
                                feats["acctbal"], feats["n_orders"]],
                               top_k=10, min_support=5)
    from .util import right_size_for_iteration
    model = Workflow([vec]).fit(base)
    _mark("transmogrify_fit")
    scored = to_ml_vector(model.score(base, keep_intermediate=True), "features")
    # deterministic 80/20 hash split on the key — layout-independent, the
    # same rows land in the holdout at any partitioning or scale
    scored = scored.withColumn(
        "split", F.when(F.pmod(F.xxhash64(F.col("key")), F.lit(5)) == 0,
                        F.lit("holdout")).otherwise(F.lit("train"))).persist()
    scored = right_size_for_iteration(scored)
    lr = LogisticRegression(featuresCol="features_ml", labelCol="label",
                            maxIter=10, regParam=0.01)
    lr_model = lr.fit(scored.where(F.col("split") == "train"))
    _mark("lr_fit")
    preds = lr_model.transform(scored) \
        .withColumn("p1", vector_to_array(F.col("probability"))[1])
    # all metrics in ONE grouped pass: distinct (split, score) rows carry
    # counts, positives, and correct-prediction counts; per-split AuROC comes
    # from the same table via split-grouped parallel rank windows
    from .util import counts_below
    g = preds.groupBy("split", F.col("p1").alias("s")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("label").cast("long")).alias("np"),
        F.sum((F.col("prediction") == F.col("label")).cast("long")).alias("ncorr"))
    ranked = counts_below(g, "s", "n", group_cols=["split"])
    return ranked.groupBy("split").agg(
        F.sum("n").alias("n"),
        F.sum("np").alias("n_pos"),
        F.sum("ncorr").alias("n_correct"),
        F.round(
            (F.sum((2 * F.col("below") + F.col("n") + 1) * F.col("np"))
             - F.sum("np") * (F.sum("np") + 1)).cast("double")
            / (2.0 * F.sum("np") * F.sum(F.col("n") - F.col("np"))),
            4).alias("auc4"))


def q_ml_train_score_merged(spark, sf_dir):
    """Rows-only registry row carrying BOTH ML fit surfaces (r9 registry
    re-seat — the driver gates only the first 50 registry keys, and the
    two rows-only ML queries don't each need a slot):

    * part='spine'     — q_ml_train_score (reader -> transmogrify -> LR ->
                         per-split integer metrics), and
    * part='selection' — q_model_selection (k-fold CV leaderboard over the
                         default binary candidate zoo).

    Both are seeded-ML outputs DuckDB cannot replicate (no oracle row by
    design); row counts and the deterministic integer metric columns stay
    comparable across rounds."""
    null_s = F.lit(None).cast("string")
    base = q_ml_train_score(spark, sf_dir).select(
        F.lit("spine").alias("part"), "split", "n", "n_pos", "n_correct",
        "auc4", null_s.alias("model"), null_s.alias("params"),
        F.lit(None).cast("double").alias("cv_auroc"))
    sel = q_model_selection(spark, sf_dir).select(
        F.lit("selection").alias("part"), null_s.alias("split"),
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("long").alias("n_pos"),
        F.lit(None).cast("long").alias("n_correct"),
        F.lit(None).cast("double").alias("auc4"),
        "model", "params", "cv_auroc")
    return base.unionByName(sel)


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; views: region nation customer supplier part
# orders lineitem events documents embeddings)
# ---------------------------------------------------------------------------

_TOKENIZE = r"regexp_split_to_array(lower({c}), '[^\p{{L}}\p{{N}}]+')"
_TOKENS = f"list_filter({_TOKENIZE}, t -> length(t) >= 1)"


def _tokens(col: str) -> str:
    return _TOKENS.format(c=col)


_SUM = "CAST(SUM(CAST({x} AS DECIMAL(28,6))) AS DOUBLE)"


def _sum(x: str) -> str:
    return _SUM.format(x=x)


ORACLES: dict[str, str] = {}

_Z_MAX = float((1 << 21) - 1)

ORACLES["scan_pushdown"] = f"""
WITH f AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
  FROM lineitem WHERE l_quantity >= 45
),
st AS (
  SELECT min(CAST(l_quantity AS DOUBLE)) AS qlo,
         max(CAST(l_quantity AS DOUBLE)) AS qhi,
         min(CAST(l_extendedprice AS DOUBLE)) AS plo,
         max(CAST(l_extendedprice AS DOUBLE)) AS phi
  FROM f
),
sc AS (
  SELECT f.*,
         CAST(floor(GREATEST(LEAST((CAST(l_quantity AS DOUBLE) - qlo)
           / (CASE WHEN qhi > qlo THEN qhi - qlo ELSE 1.0 END), 1.0), 0.0)
           * {_Z_MAX}) AS BIGINT) AS sq,
         CAST(floor(GREATEST(LEAST((CAST(l_extendedprice AS DOUBLE) - plo)
           / (CASE WHEN phi > plo THEN phi - plo ELSE 1.0 END), 1.0), 0.0)
           * {_Z_MAX}) AS BIGINT) AS sp
  FROM f, st
)
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       (((sq >> 0) & 1) << 0)
         | (((sp >> 0) & 1) << 1)
         | (((sq >> 1) & 1) << 2)
         | (((sp >> 1) & 1) << 3)
         | (((sq >> 2) & 1) << 4)
         | (((sp >> 2) & 1) << 5)
         | (((sq >> 3) & 1) << 6)
         | (((sp >> 3) & 1) << 7)
         | (((sq >> 4) & 1) << 8)
         | (((sp >> 4) & 1) << 9)
         | (((sq >> 5) & 1) << 10)
         | (((sp >> 5) & 1) << 11)
         | (((sq >> 6) & 1) << 12)
         | (((sp >> 6) & 1) << 13)
         | (((sq >> 7) & 1) << 14)
         | (((sp >> 7) & 1) << 15)
         | (((sq >> 8) & 1) << 16)
         | (((sp >> 8) & 1) << 17)
         | (((sq >> 9) & 1) << 18)
         | (((sp >> 9) & 1) << 19)
         | (((sq >> 10) & 1) << 20)
         | (((sp >> 10) & 1) << 21)
         | (((sq >> 11) & 1) << 22)
         | (((sp >> 11) & 1) << 23)
         | (((sq >> 12) & 1) << 24)
         | (((sp >> 12) & 1) << 25)
         | (((sq >> 13) & 1) << 26)
         | (((sp >> 13) & 1) << 27)
         | (((sq >> 14) & 1) << 28)
         | (((sp >> 14) & 1) << 29)
         | (((sq >> 15) & 1) << 30)
         | (((sp >> 15) & 1) << 31)
         | (((sq >> 16) & 1) << 32)
         | (((sp >> 16) & 1) << 33)
         | (((sq >> 17) & 1) << 34)
         | (((sp >> 17) & 1) << 35)
         | (((sq >> 18) & 1) << 36)
         | (((sp >> 18) & 1) << 37)
         | (((sq >> 19) & 1) << 38)
         | (((sp >> 19) & 1) << 39)
         | (((sq >> 20) & 1) << 40)
         | (((sp >> 20) & 1) << 41)
       AS zkey
FROM sc
"""


ORACLES["pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       {_sum('l_quantity')} AS sum_qty,
       {_sum('l_extendedprice')} AS sum_base_price,
       {_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_sum('l_quantity')} / CAST(count(*) AS DOUBLE) AS avg_qty,
       count(*) AS count_order
FROM lineitem WHERE l_quantity <= 49
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["join_left_agg"] = f"""
SELECT 'left' AS part, CAST(c_custkey AS VARCHAR) AS key,
       CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 END) AS BIGINT) AS n_orders,
       {_sum('o_totalprice')} AS total_spend,
       max(o_totalprice) AS max_order
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
UNION ALL
SELECT 'inner', c_mktsegment,
       count(*),
       {_sum('o_totalprice')},
       max(o_totalprice)
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""

ORACLES["join_outer_combined"] = f"""
SELECT CAST(COALESCE(n_nationkey, s_nationkey) AS BIGINT) AS nationkey,
       max(n_name) AS n_name,
       CAST(SUM(CASE WHEN s_suppkey IS NOT NULL THEN 1 END) AS BIGINT) AS n_suppliers,
       {_sum('s_acctbal')} AS total_bal
FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
GROUP BY COALESCE(n_nationkey, s_nationkey)
"""

ORACLES["multiway_broadcast"] = f"""
SELECT r_name, count(*) AS n_orders, {_sum('o_totalprice')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

ORACLES["agg_reader_cutoff"] = f"""
SELECT a.key, a.total_value, a.n_events, a.n_purchases, a.max_value,
       a.types_seen, a.error_after,
       b.pre_value, b.pre_events, b.pre_types
FROM (
  SELECT CAST(user_id AS VARCHAR) AS key,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{CUTOFF}'
                  THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS total_value,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{CUTOFF}' THEN 1 END) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{CUTOFF}' AND event_type = 'purchase'
                  THEN 1 END) AS BIGINT) AS n_purchases,
         max(CASE WHEN ts < TIMESTAMP '{CUTOFF}' THEN value END) AS max_value,
         COALESCE(array_to_string(list_sort(list(DISTINCT event_type)
                  FILTER (WHERE ts < TIMESTAMP '{CUTOFF}')), ','), '') AS types_seen,
         bool_or(event_type = 'error') FILTER (WHERE ts >= TIMESTAMP '{CUTOFF}') AS error_after
  FROM events
  GROUP BY user_id
) a LEFT JOIN (
  WITH cut AS (
    SELECT user_id, min(ts) FILTER (WHERE event_type = 'purchase') AS cutoff
    FROM events GROUP BY user_id
  )
  SELECT CAST(e.user_id AS VARCHAR) AS key,
         CAST(SUM(CASE WHEN e.ts < c.cutoff
                  THEN CAST(e.value AS DECIMAL(28,6)) END) AS DOUBLE) AS pre_value,
         CAST(SUM(CASE WHEN e.ts < c.cutoff THEN 1 END) AS BIGINT) AS pre_events,
         COALESCE(array_to_string(list_sort(list(DISTINCT e.event_type)
                  FILTER (WHERE e.ts < c.cutoff)), ','), '') AS pre_types
  FROM events e JOIN cut c ON e.user_id = c.user_id
  WHERE c.cutoff IS NOT NULL
  GROUP BY e.user_id
) b USING (key)
"""

ORACLES["agg_first_last"] = """
WITH mode_pick AS (
  SELECT user_id, event_type AS type_mode,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type ASC) AS rn
  FROM events GROUP BY user_id, event_type
)
SELECT CAST(e.user_id AS VARCHAR) AS key,
       (min(struct_pack(t := e.ts, v := e.event_type))).v AS first_type,
       (max(struct_pack(t := e.ts, v := e.event_type))).v AS last_type,
       (min(struct_pack(t := e.ts, v := e.value))).v AS first_value,
       (max(struct_pack(t := e.ts, v := e.value))).v AS last_value,
       min(epoch_ms(e.ts)) AS min_ts_ms,
       max(epoch_ms(e.ts)) AS max_ts_ms,
       string_agg(e.event_type, ',' ORDER BY e.ts, e.event_type) AS type_concat,
       max(m.type_mode) AS type_mode,
       bool_or(e.value > 90) AS any_high,
       bool_and(e.value > 0) AS all_positive,
       (CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) % 2) = 1
         AS odd_purchases
FROM events e JOIN mode_pick m ON e.user_id = m.user_id AND m.rn = 1
GROUP BY e.user_id
"""

ORACLES["map_monoid"] = """
SELECT 'monoid' AS part, CAST(user_id AS VARCHAR) AS key,
       'k' AS map_key,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total,
       CAST(NULL AS DOUBLE) AS k_value, CAST(NULL AS DOUBLE) AS k_null
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY user_id
UNION ALL
SELECT 'vectorizer', CAST(event_id AS VARCHAR), 'k', CAST(NULL AS BIGINT),
       COALESCE(CAST(json_extract_string(props, '$.k') AS DOUBLE), m.fill),
       CASE WHEN json_extract_string(props, '$.k') IS NULL
            THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END
FROM events, (
  SELECT CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE)
                       AS DECIMAL(30,8))) AS DOUBLE)
         / count(json_extract_string(props, '$.k')) AS fill
  FROM events
) m
"""

ORACLES["filter_math_ops"] = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity > 25 THEN l_quantity END AS qty_filtered,
       CASE WHEN l_returnflag = 'N' THEN 'NONE' ELSE l_returnflag END AS flag_replaced,
       COALESCE(l_returnflag IN ('A','R'), FALSE) AS is_returned,
       CASE WHEN l_tax IS NOT NULL AND l_tax > 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS tax_occurs,
       CASE WHEN isnan(x) OR abs(x) = 'infinity'::DOUBLE THEN NULL ELSE x END AS charge,
       CASE WHEN isnan(u) OR abs(u) = 'infinity'::DOUBLE THEN NULL ELSE u END AS unit_price,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       round(l_extendedprice, 1) AS price_round1,
       sqrt(l_quantity) AS qty_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln6,
       round(exp(l_discount), 6) AS disc_exp6,
       pow(l_quantity, 2.0) AS qty_sq,
       abs(l_discount - 0.05) AS disc_dev
FROM (SELECT *, l_extendedprice * ((1 - l_discount) * (1 + l_tax)) AS x,
             l_extendedprice / l_quantity AS u
      FROM lineitem)
"""

_EMAIL_RE_SQL = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"

_PII_EMAIL = PII.PII_PATTERNS["email"]
_PII_IPV4 = PII.PII_PATTERNS["ipv4"]

def _ph_valid_sql(nat: str, region: str) -> str:
    """One region's validity predicate, generated from the SAME
    _REGION_META row parse_phone uses (length window + lead regex + the
    NANP 4th-digit rule for cc=1)."""
    from .functions.text import _REGION_META
    cc, lo, hi, lead = _REGION_META[region]
    cond = (f"(length({nat}) BETWEEN {lo} AND {hi} "
            f"AND regexp_matches({nat}, '^(?:{lead})'))")
    if cc == "1":
        cond = (f"({cond} AND regexp_matches({nat}, "
                f"'^[2-9][0-9]{{2}}[2-9]'))")
    return cond


_PH_INTL_VALID = (
    "CASE CAST(c_custkey % 3 AS INT) "
    f"WHEN 0 THEN {_ph_valid_sql('inat', 'US')} "
    f"WHEN 1 THEN {_ph_valid_sql('inat', 'GB')} "
    f"ELSE {_ph_valid_sql('inat', 'DE')} END")
_PH_NAT_SUB = (
    f"({_ph_valid_sql('d10', 'US')} "
    "AND d10 LIKE '2%' AND length(d10) BETWEEN 10 AND 10 "
    "AND regexp_matches(d10, '^(?:[2-8][0-9]{9})$'))")

ORACLES["text_ops"] = f"""
SELECT c_custkey,
       CAST(len({_tokens('c_name')}) AS BIGINT) AS n_tokens,
       CAST(COALESCE(length(c_name), 0) AS BIGINT) AS name_len,
       COALESCE(contains(lower(c_name), 'customer'), FALSE) AS has_customer,
       email,
       regexp_matches(email, '{_EMAIL_RE_SQL}') AS email_valid,
       CASE WHEN regexp_matches(email, '{_EMAIL_RE_SQL}')
            THEN regexp_extract(email, '^([^@]+)@', 1) END AS email_prefix,
       CASE WHEN regexp_matches(email, '{_EMAIL_RE_SQL}')
            THEN regexp_extract(email, '@(.+)$', 1) END AS email_domain,
       array_to_string({_tokens('c_name')}, '|') AS tokens_joined,
       phone,
       regexp_replace(phone, '[^0-9]', '', 'g') AS phone_digits,
       CASE WHEN length(d10) = 10 AND d10 NOT LIKE '0%' AND d10 NOT LIKE '1%'
            THEN TRUE ELSE FALSE END AS phone_valid,
       CASE WHEN {_PH_NAT_SUB} THEN '+1' || d10 END AS ph_e164,
       COALESCE({_PH_NAT_SUB}, FALSE) AS ph_sub_valid,
       CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'US'
            WHEN 1 THEN 'GB' ELSE 'DE' END AS intl_region,
       COALESCE({_PH_INTL_VALID}, FALSE) AS intl_valid,
       CASE WHEN {_PH_INTL_VALID}
            THEN '+' || icc || inat END AS intl_e164,
       note AS pii_note,
       CAST(len(regexp_extract_all(note, '{_PII_EMAIL}')) AS INTEGER) AS pii_emails,
       CAST(len(regexp_extract_all(note, '{_PII_IPV4}')) AS INTEGER) AS pii_ipv4,
       CAST(CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END AS INTEGER) AS pii_cards,
       regexp_replace(regexp_replace(note, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                      '{_PII_IPV4}', '[IPV4]', 'g') AS note_redacted
FROM (
  SELECT *, CASE WHEN length(d) = 11 AND d LIKE '1%' THEN substr(d, 2, 10) ELSE d END AS d10,
         CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN '1'
              WHEN 1 THEN '44' ELSE '49' END AS icc,
         substr(p, 1, CAST(c_custkey % 8 + 4 AS INT)) AS inat,
         'contact ' || (CASE WHEN c_custkey % 3 = 0 THEN 'none' ELSE email END)
           || ' from 10.' || CAST(c_custkey % 256 AS VARCHAR) || '.0.1 card '
           || (CASE WHEN c_custkey % 2 = 0 THEN '4532015112830366'
                    ELSE '4532015112830367' END) AS note
  FROM (
    SELECT *, regexp_replace(phone, '[^0-9]', '', 'g') AS d
    FROM (
      SELECT *,
             regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g') || '@example.com' AS email,
             '(' || substr(p, 1, 3) || ') ' || substr(p, 4, 3) || '-' || substr(p, 7, 4) AS phone
      FROM (SELECT *, lpad(CAST(c_custkey * 7919 % 10000000000 AS VARCHAR), 10, '2') AS p
            FROM customer)
    )
  )
)
"""

ORACLES["date_ops"] = """
SELECT o_orderkey,
       CAST(dayofmonth(o_orderdate) AS BIGINT) AS day_of_month,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS day_of_week,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS day_of_year,
       CAST(month(o_orderdate) AS BIGINT) AS month_of_year,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS week_of_year,
       epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
       round(sin(CAST(dayofyear(o_orderdate) AS DOUBLE) * 2 * pi() / 366.0), 6) + 0.0 AS doy_sin6,
       round(cos(CAST(dayofyear(o_orderdate) AS DOUBLE) * 2 * pi() / 366.0), 6) + 0.0 AS doy_cos6
FROM orders
"""

ORACLES["set_ops"] = """
SELECT CAST(k AS BIGINT) AS k, 'both' AS set_op, CAST(NULL AS DOUBLE) AS val
FROM (
  SELECT DISTINCT o_custkey AS k FROM orders
  INTERSECT
  SELECT DISTINCT user_id AS k FROM events
)
UNION ALL
SELECT CAST(k AS BIGINT), 'orders_only', CAST(NULL AS DOUBLE) FROM (
  SELECT DISTINCT o_custkey AS k FROM orders
  EXCEPT
  SELECT DISTINCT user_id AS k FROM events
)
UNION ALL
SELECT CAST(o_orderkey AS BIGINT), 'top_order', CAST(o_totalprice AS DOUBLE)
FROM (
  SELECT o_orderkey, o_totalprice FROM orders
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 20
)
"""

_SPEARMAN_SQL = """
WITH d AS (SELECT o_totalprice AS x, o_totalprice % 1000 AS y FROM orders),
rx AS (
  SELECT v AS x, 2 * COALESCE(SUM(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
         PRECEDING AND 1 PRECEDING), 0) + n + 1 AS rx2
  FROM (SELECT x AS v, count(*) AS n FROM d GROUP BY x)
),
ry AS (
  SELECT v AS y, 2 * COALESCE(SUM(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
         PRECEDING AND 1 PRECEDING), 0) + n + 1 AS ry2
  FROM (SELECT y AS v, count(*) AS n FROM d GROUP BY y)
),
j AS (SELECT rx2, ry2 FROM d JOIN rx USING (x) JOIN ry USING (y)),
s AS (
  SELECT count(*) AS n, CAST(SUM(rx2) AS BIGINT) AS sx, CAST(SUM(ry2) AS BIGINT) AS sy,
         CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy,
         CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
         CAST(SUM(ry2 * ry2) AS BIGINT) AS syy
  FROM j
)
SELECT n AS n_rows,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6)
         AS spearman6
FROM s
"""

ORACLES["joined_secondary_agg"] = f"""
SELECT CAST(c_custkey AS VARCHAR) AS key,
       CAST(SUM(CASE WHEN ts < TIMESTAMP '{CUTOFF}'
                THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS pre_value,
       CAST(SUM(CASE WHEN ts < TIMESTAMP '{CUTOFF}' THEN 1 END) AS BIGINT) AS pre_events,
       max(CASE WHEN ts < TIMESTAMP '{CUTOFF}' THEN c_acctbal END) AS bal
FROM customer JOIN events ON c_custkey = user_id
GROUP BY c_custkey
"""

_CRAMERS_SQL = """
WITH cells AS (
  SELECT c_mktsegment AS a, o_orderstatus AS b, count(*) AS n
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_mktsegment, o_orderstatus
), rt AS (SELECT a, SUM(n) AS rt FROM cells GROUP BY a),
ct AS (SELECT b, SUM(n) AS ct FROM cells GROUP BY b),
tot AS (SELECT SUM(n) AS N, count(DISTINCT a) AS R, count(DISTINCT b) AS C FROM cells),
s AS (
  SELECT SUM(CAST(c.n * c.n AS DOUBLE) / CAST(rt.rt * ct.ct AS DOUBLE)) AS s,
         max(tot.N) AS N, max(tot.R) AS R, max(tot.C) AS C
  FROM cells c JOIN rt ON c.a = rt.a JOIN ct ON c.b = ct.b CROSS JOIN tot
)
SELECT CAST(N AS BIGINT) AS n_pairs,
       round(sqrt(CAST(N * (s - 1) AS DOUBLE) / CAST(N * least(R - 1, C - 1) AS DOUBLE)), 6)
         AS cramers_v6
FROM s
"""

ORACLES["onehot_topk"] = """
WITH topk AS (
  SELECT c_mktsegment AS v
  FROM customer WHERE c_mktsegment IS NOT NULL
  GROUP BY c_mktsegment HAVING count(*) >= 10
  ORDER BY count(*) DESC, v ASC LIMIT 3
),
ranks AS (
  SELECT c_mktsegment AS v,
         row_number() OVER (ORDER BY count(*) DESC, c_mktsegment ASC) - 1 AS idx,
         count(*) OVER () AS n_labels
  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment
)
SELECT c_custkey, COALESCE(t.v, 'OTHER') AS bucket,
       CAST(COALESCE(r.idx, (SELECT max(n_labels) FROM ranks)) AS BIGINT) AS seg_idx
FROM customer LEFT JOIN topk t ON c_mktsegment = t.v
              LEFT JOIN ranks r ON c_mktsegment = r.v
"""

ORACLES["date_list_vectorizer"] = """
SELECT CAST(user_id AS VARCHAR) AS key,
       CAST(DATE '2024-02-01' - CAST(make_timestamp(min(epoch_ms(ts)) * 1000) AS DATE)
            AS DOUBLE) AS days_since_first,
       CAST(DATE '2024-02-01' - CAST(make_timestamp(max(epoch_ms(ts)) * 1000) AS DATE)
            AS DOUBLE) AS days_since_last
FROM events
GROUP BY user_id
"""

ORACLES["geo_midpoint"] = """
SELECT c_mktsegment,
       CAST(SUM(CAST(CAST(c_custkey % 180 - 90 AS DOUBLE) AS DECIMAL(30,8))) AS DOUBLE)
         / count(*) AS mid_lat,
       CAST(SUM(CAST(CAST(c_custkey % 360 - 180 AS DOUBLE) AS DECIMAL(30,8))) AS DOUBLE)
         / count(*) AS mid_lon,
       CAST(SUM(CAST(1.0 AS DECIMAL(30,8))) AS DOUBLE) / count(*) AS mid_acc
FROM customer
GROUP BY c_mktsegment
"""

_EN_SW = "[" + ",".join(f"'{w}'" for w in
                        ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]) + "]"


# -- Porter stemmer replica, GENERATED from the same rule tables the
# Spark expressions use (functions/porter._STEP2/3/4) — the mime-CASE /
# lexicon-lattice oracle pattern: one source of truth, two engines.

def _p_cv(s: str) -> str:
    # the same two-rewrite consonant/vowel skeleton (verified: RE2's
    # left-to-right non-overlapping scan matches Java's for ([^a])y)
    return ("regexp_replace(regexp_replace(" + s +
            ", '[aeiou]', 'a', 'g'), '([^a])y', '\\1a', 'g')")


def _p_m(s: str) -> str:
    return f"len(regexp_extract_all({_p_cv(s)}, 'a+[^a]+'))"


def _p_hv(s: str) -> str:
    return f"contains({_p_cv(s)}, 'a')"


def _p_dbl(s: str) -> str:
    return (f"(length({s}) >= 2 AND substr({s}, length({s})-1, 1) = "
            f"substr({s}, length({s}), 1) AND "
            f"regexp_matches({_p_cv(s)}, '[^a]$'))")


def _p_o(s: str) -> str:
    return (f"(regexp_matches({_p_cv(s)}, '[^a]a[^a]$') AND NOT "
            f"regexp_matches({s}, '[wxy]$'))")


def _p_trim(w: str, n: int) -> str:
    return f"substr({w}, 1, length({w}) - {n})"


def _p_rules_sql(w: str, rules) -> str:
    """One step's CASE chain — first matching suffix wins, a failed
    condition leaves the word (no fallthrough), same as _rules."""
    from .functions.porter import _M0, _M1
    parts = []
    for sfx, repl, cond in rules:
        stem = _p_trim(w, len(sfx))
        new = f"({stem} || '{repl}')" if repl else stem
        if cond is None:
            val = new
        else:
            if cond is _M0:
                c = f"{_p_m(stem)} > 0"
            elif cond is _M1:
                c = f"{_p_m(stem)} > 1"
            elif sfx == "ion":
                c = (f"({_p_m(stem)} > 1 AND "
                     f"regexp_matches({stem}, '[st]$'))")
            else:
                raise AssertionError(f"unknown condition for {sfx!r}")
            val = f"CASE WHEN {c} THEN {new} ELSE {w} END"
        parts.append(f"WHEN ends_with({w}, '{sfx}') THEN {val}")
    return "CASE " + " ".join(parts) + f" ELSE {w} END"


def _p_adjust(t: str) -> str:
    # step 1b's post-trim fixups
    return (f"CASE WHEN ends_with({t},'at') OR ends_with({t},'bl') "
            f"OR ends_with({t},'iz') THEN ({t} || 'e') "
            f"WHEN {_p_dbl(t)} AND NOT regexp_matches({t}, '[lsz]$') "
            f"THEN {_p_trim(t, 1)} "
            f"WHEN {_p_m(t)} = 1 AND {_p_o(t)} THEN ({t} || 'e') "
            f"ELSE {t} END")


def _porter_ctes(word_expr: str) -> str:
    """The full five-step chain as CTEs pw0..pw7 over documents —
    CTE-per-step is the SQL bind-once (each step's text references its
    input COLUMN, never the previous step's expression)."""
    from .functions.porter import _STEP2, _STEP3, _STEP4
    s1a = _p_rules_sql("w", [("sses", "ss", None), ("ies", "i", None),
                             ("ss", "ss", None), ("s", "", None)])
    e3, e2 = _p_trim("w", 3), _p_trim("w", 2)
    s1b = (f"CASE WHEN ends_with(w, 'eed') THEN "
           f"(CASE WHEN {_p_m(e3)} > 0 THEN {_p_trim('w', 1)} ELSE w END) "
           f"WHEN ends_with(w, 'ed') AND {_p_hv(e2)} THEN {_p_adjust(e2)} "
           f"WHEN ends_with(w, 'ing') AND {_p_hv(e3)} THEN {_p_adjust(e3)} "
           f"ELSE w END")
    e1 = _p_trim("w", 1)
    s1c = (f"CASE WHEN ends_with(w, 'y') AND {_p_hv(e1)} "
           f"THEN ({e1} || 'i') ELSE w END")
    s5a = (f"CASE WHEN ends_with(w, 'e') AND ({_p_m('w')} > 1 OR "
           f"({_p_m('w')} = 1 AND NOT {_p_o(e1)})) THEN {e1} ELSE w END")
    s5b = (f"CASE WHEN ends_with(w, 'll') AND {_p_m('w')} > 1 "
           f"THEN {_p_trim('w', 1)} ELSE w END")
    return f"""pw0 AS (
  SELECT doc_id, {word_expr} AS w0, {word_expr} AS w FROM documents
), pw1 AS (SELECT doc_id, w0, {s1a} AS w FROM pw0
), pw2 AS (SELECT doc_id, w0, {s1b} AS w FROM pw1
), pw3 AS (SELECT doc_id, w0, {s1c} AS w FROM pw2
), pw4 AS (SELECT doc_id, w0, {_p_rules_sql('w', _STEP2)} AS w FROM pw3
), pw5 AS (SELECT doc_id, w0, {_p_rules_sql('w', _STEP3)} AS w FROM pw4
), pw6 AS (SELECT doc_id, w0, {_p_rules_sql('w', _STEP4)} AS w FROM pw5
), pw7 AS (SELECT doc_id, w0, {s5b} AS w
           FROM (SELECT doc_id, w0, {s5a} AS w FROM pw6)
), pfin AS (
  SELECT doc_id, w0 AS porter_word,
         CASE WHEN length(w0) <= 2 THEN w0 ELSE w END AS porter
  FROM pw7
)"""


_P_ROOTS_SQL = "[" + ",".join(f"'{r}'" for r in _P_ROOTS) + "]"
_P_TAILS_SQL = "[" + ",".join(f"'{t}'" for t in _P_TAILS) + "]"
_P_WORD_SQL = (f"(({_P_ROOTS_SQL})[CAST(doc_id % {len(_P_ROOTS)} + 1 "
               f"AS INT)] || ({_P_TAILS_SQL})[CAST((doc_id // "
               f"{len(_P_ROOTS)}) % {len(_P_TAILS)} + 1 AS INT)])")


def _wp_ctes() -> str:
    """The WordPiece greedy cursor scan as a recursive CTE — the
    longest-first probe at the cursor is a CASE over piece lengths
    generated from the SAME fixture vocabulary the Spark arm uses;
    recursion stops on a dead cursor (bad) or past-end position, the
    terminal row per doc is the answer ([UNK] for bad words — fixture
    words are single words, the published whole-word rule)."""
    vocab_sql = "[" + ",".join(f"'{p}'" for p in _WP_GATE_VOCAB) + "]"
    max_len = max(len(p) for p in _WP_GATE_VOCAB)
    word = (f"(({'[' + ','.join(chr(39) + r + chr(39) for r in _WP_ROOTS) + ']'})"
            f"[CAST(doc_id % {len(_WP_ROOTS)} + 1 AS INT)] || "
            f"({'[' + ','.join(chr(39) + t + chr(39) for t in _WP_TAILS) + ']'})"
            f"[CAST((doc_id // {len(_WP_ROOTS)}) % {len(_WP_TAILS)} + 1 "
            f"AS INT)])")
    branches = []
    for ln in range(max_len, 0, -1):
        cand = (f"(CASE WHEN pos > 1 THEN '##' || substr(w, pos, {ln}) "
                f"ELSE substr(w, pos, {ln}) END)")
        branches.append(
            f"WHEN pos + {ln} - 1 <= length(w) AND "
            f"list_contains({vocab_sql}, {cand}) THEN {cand}")
    best = "CASE " + " ".join(branches) + " ELSE NULL END"
    return f"""wpw AS (
  SELECT doc_id, {word} AS w FROM documents
),
wps AS (
  SELECT doc_id, w, 1 AS pos, CAST('' AS VARCHAR) AS acc, FALSE AS bad
  FROM wpw
  UNION ALL
  SELECT doc_id, w,
         CASE WHEN best IS NULL THEN pos
              ELSE pos + length(best)
                   - CASE WHEN pos > 1 THEN 2 ELSE 0 END END AS pos,
         CASE WHEN best IS NULL THEN acc
              WHEN acc = '' THEN best
              ELSE acc || ' ' || best END AS acc,
         best IS NULL AS bad
  FROM (SELECT doc_id, w, pos, acc, {best} AS best
        FROM wps WHERE NOT bad AND pos <= length(w))
),
wpf AS (
  SELECT doc_id, w AS wp_word,
         CASE WHEN bad THEN '[UNK]' ELSE acc END AS wp_pieces,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY bad DESC, pos DESC) AS rn
  FROM wps
)"""

# -- Snowball de/fr/es replicas, GENERATED from the same rule tables
# the Spark expressions use by the same interpreter walking the same
# control flow (functions/snowball.snowball_sql_ctes) — CTE-per-step
# is the SQL bind-once, exactly the porter pattern.
def _sb_ctes() -> tuple[str, str]:
    from .functions.snowball import snowball_sql_ctes
    chains, joins = [], []
    for lang, roots, tails in _SB_FIXTURES:
        ctes, fin = snowball_sql_ctes(
            lang, _sb_word_sql(roots, tails), f"sb{lang}")
        chains.append(ctes)
        joins.append(fin)
    return ",\n".join(chains), joins


_SB_FIXTURES = [
    ("de", _SB_DE_ROOTS, _SB_DE_TAILS),
    ("fr", _SB_FR_ROOTS, _SB_FR_TAILS),
    ("es", _SB_ES_ROOTS, _SB_ES_TAILS),
    ("sv", _SB_SV_ROOTS, _SB_SV_TAILS),
    ("no", _SB_NO_ROOTS, _SB_NO_TAILS),
    ("da", _SB_DA_ROOTS, _SB_DA_TAILS),
    ("ru", _SB_RU_ROOTS, _SB_RU_TAILS),
    ("it", _SB_IT_ROOTS, _SB_IT_TAILS),
    ("nl", _SB_NL_ROOTS, _SB_NL_TAILS),
    ("pt", _SB_PT_ROOTS, _SB_PT_TAILS),
    ("ro", _SB_RO_ROOTS, _SB_RO_TAILS),
    ("fi", _SB_FI_ROOTS, _SB_FI_TAILS),
    ("hu", _SB_HU_ROOTS, _SB_HU_TAILS),
]
_SB_CHAINS, _SB_FINS = _sb_ctes()
_SB_SELECTS = ",\n".join(
    f"       {fin}.w0 AS sb_{lg}_word, {fin}.stem AS sb_{lg}"
    for (lg, _, _), fin in zip(_SB_FIXTURES, _SB_FINS))
_SB_JOINS = "\n".join(
    f"        JOIN {fin} ON ns.doc_id = {fin}.doc_id"
    for fin in _SB_FINS)

ORACLES["stopwords_ngrams"] = f"""
WITH RECURSIVE {_porter_ctes(_P_WORD_SQL)},
{_wp_ctes()},
{_SB_CHAINS},
t AS (
  SELECT doc_id, {_tokens('text')} AS toks FROM documents
), ns AS (
  SELECT doc_id, toks,
         list_filter(toks, x -> NOT list_contains({_EN_SW}, x)) AS nostop
  FROM t
), sim AS (
  SELECT a.doc_id,
         CASE WHEN len(list_distinct(list_concat(a.toks, b.toks))) = 0 THEN 1.0
              ELSE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                   / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE)
         END AS next_jaccard
  FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
)
SELECT ns.doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(nostop) AS BIGINT) AS n_tokens_nostop,
       CAST(CASE WHEN len(nostop) >= 2 THEN len(nostop) - 1 ELSE 0 END AS BIGINT) AS n_bigrams,
       CASE WHEN len(nostop) >= 2 THEN nostop[1] || ' ' || nostop[2] ELSE '' END AS first_bigram,
       pfin.porter_word, pfin.porter,
       wpf.wp_word, wpf.wp_pieces,
{_SB_SELECTS},
       sim.next_jaccard
FROM ns LEFT JOIN sim ON ns.doc_id = sim.doc_id
        JOIN pfin ON ns.doc_id = pfin.doc_id
        JOIN wpf ON ns.doc_id = wpf.doc_id AND wpf.rn = 1
{_SB_JOINS}
"""

ORACLES["multilabel_topn"] = """
SELECT o_orderkey,
       CASE WHEN pa >= pb AND pa >= pc THEN 'a'
            WHEN pb >= pc THEN 'b' ELSE 'c' END AS top1_label,
       CASE WHEN pa >= pb AND pa >= pc THEN pa
            WHEN pb >= pc THEN pb ELSE pc END AS top1_p
FROM (SELECT o_orderkey,
             (o_totalprice % 97) / 97.0 AS pa,
             (o_totalprice % 89) / 89.0 AS pb,
             (o_totalprice % 83) / 83.0 AS pc
      FROM orders)
"""

_NAMES_SQL = "[" + ",".join(f"'{n}'" for n in [
    "james", "mary", "john", "patricia", "robert", "jennifer", "michael",
    "linda", "william", "elizabeth", "david", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "sarah", "charles", "karen", "maria",
    "anna", "jose", "juan", "luis", "carlos", "ana", "wei", "li", "chen",
]) + "]"

ORACLES["name_lang_detect"] = f"""
WITH base AS (
  SELECT doc_id, text,
         (['James','Maria','Wei','Zzyzx'])[CAST(doc_id % 4 + 1 AS INT)] || ' Smith'
           AS synth_name,
         {_tokens('text')} AS toks
  FROM documents
), nm AS (
  SELECT *, {_tokens('synth_name')} AS ntoks FROM base
),
-- NB language-ID replica (llm/langid_nb, portable fit on doc_id < 100):
-- char bigrams of lower(text) with whitespace collapsed, top-500 vocab
-- (total desc, gram asc), Laplace logP = round(ln((c+0.5)/(tot+0.5*(V+1))),6),
-- doc prior = round(ln(nd/n),6), per-doc DECIMAL(18,6) fold / gram count,
-- argmax (score desc, lang asc)
nbt AS (
  SELECT doc_id, lang,
         regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
  FROM documents
),
nbg AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, length(t) - 1),
                               i -> substr(t, i, 2))) AS g
  FROM nbt WHERE length(t) >= 2
),
nblg AS (SELECT lang, g, count(*) AS c FROM nbg
         WHERE doc_id < 100 GROUP BY lang, g),
nbvocab AS (SELECT g FROM (SELECT g, sum(c) AS tt FROM nblg GROUP BY g
                           ORDER BY tt DESC, g LIMIT 500)),
nbv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM nbvocab),
nbtot AS (SELECT lang, CAST(sum(c) AS DOUBLE) AS tot FROM nblg
          GROUP BY lang),
nbprior AS (
  SELECT lang,
         round(ln(CAST(count(*) AS DOUBLE)
                  / CAST((SELECT count(*) FROM documents
                          WHERE doc_id < 100) AS DOUBLE)), 6) AS pr
  FROM documents WHERE doc_id < 100 GROUP BY lang
),
nblp AS (
  SELECT vv.g, t.lang,
         round(ln((CAST(COALESCE(c.c, 0) AS DOUBLE) + CAST(0.5 AS DOUBLE))
                  / (t.tot + CAST(0.5 AS DOUBLE)
                             * (nbv.v + CAST(1.0 AS DOUBLE)))), 6) AS lp
  FROM nbvocab vv CROSS JOIN nbtot t CROSS JOIN nbv
  LEFT JOIN nblg c ON c.g = vv.g AND c.lang = t.lang
),
nbunk AS (
  SELECT t.lang,
         round(ln(CAST(0.5 AS DOUBLE)
                  / (t.tot + CAST(0.5 AS DOUBLE)
                             * (nbv.v + CAST(1.0 AS DOUBLE)))), 6) AS lp
  FROM nbtot t CROSS JOIN nbv
),
nbdoc AS (
  SELECT g.doc_id, t.lang AS ml,
         (CAST(SUM(CAST(COALESCE(lp.lp, u.lp) AS DECIMAL(18,6)))
               AS DOUBLE) + max(p.pr)) / count(*) AS score
  FROM nbg g
  CROSS JOIN (SELECT lang FROM nbtot) t
  LEFT JOIN nblp lp ON lp.g = g.g AND lp.lang = t.lang
  JOIN nbunk u ON u.lang = t.lang
  JOIN nbprior p ON p.lang = t.lang
  GROUP BY g.doc_id, t.lang
),
nbbest AS (
  SELECT doc_id, ml, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, ml ASC) AS rn
  FROM nbdoc
),
nbout AS (
  SELECT b.doc_id,
         COALESCE(max(CASE WHEN w.rn = 1 THEN w.ml END), 'und') AS nb_pred,
         max(CASE WHEN d.ml = 'en' THEN d.score END) AS nb_en,
         max(CASE WHEN d.ml = 'de' THEN d.score END) AS nb_de
  FROM nbt b
  LEFT JOIN nbbest w ON w.doc_id = b.doc_id
  LEFT JOIN nbdoc d ON d.doc_id = b.doc_id
  GROUP BY b.doc_id
)
SELECT nm.doc_id, synth_name,
       (CASE WHEN len(ntoks) = 0 THEN 0.0
             ELSE CAST(len(list_filter(ntoks, t -> list_contains({_NAMES_SQL}, t))) AS DOUBLE)
                  / CAST(len(ntoks) AS DOUBLE) END) >= 0.5 AS is_name,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE CAST(len(list_filter(toks, t -> list_contains(
                 ['the','and','of','to','a','in','is','it','that','for'], t))) AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE) END AS score_en,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE CAST(len(list_filter(toks, t -> list_contains(
                 ['der','die','das','und','ist','von','mit','ein','eine','zu'], t))) AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE) END AS score_de,
       o.nb_pred, o.nb_en, o.nb_de
FROM nm JOIN nbout o ON o.doc_id = nm.doc_id
"""

def _sql_strs(xs):
    return "[" + ",".join(f"'{x}'" for x in xs) + "]"


# full SQL replica of the Viterbi lexicon segmenter: the dp lattice as a
# recursive CTE carrying the (cost, backpointer) list per position,
# candidate min by (cost, bp) ascending (list_sort on structs — the same
# tie rule as Spark's array_min), unknown single chars at cost 2.0, then
# a recursive backtrack walk splitting the tokens
ORACLES["lexicon_segment"] = f"""
WITH RECURSIVE
t AS (
  SELECT doc_id,
         ({_sql_strs(_SEG_WORDS)})[CAST(doc_id % 8 + 1 AS INT)]
         || ({_sql_strs(_SEG_WORDS)})[CAST((doc_id // 8) % 8 + 1 AS INT)]
         || ({_sql_strs(_SEG_WORDS)})[CAST((doc_id // 64) % 8 + 1 AS INT)]
         || CASE WHEN doc_id % 5 = 0 THEN '卡' ELSE '' END AS s
  FROM documents
),
dp AS (
  SELECT doc_id, s, 0 AS j,
         [struct_pack(cost := 0.0, bp := CAST(-1 AS INT))] AS lat
  FROM t
  UNION ALL
  SELECT doc_id, s, j + 1,
         list_append(lat, (
           list_sort(list_transform(
             generate_series(CASE WHEN j - 2 > 0 THEN j - 2 ELSE 0 END, j),
             i -> struct_pack(
               cost := struct_extract(lat[CAST(i AS INT) + 1], 'cost')
                       + COALESCE(
                           map_extract(
                             map({_sql_strs(_SEG_WORDS)},
                                 [{",".join(repr(c) for _, c in _SEG_LEX)}]),
                             substr(s, CAST(i AS INT) + 1,
                                    j + 1 - CAST(i AS INT)))[1],
                           CASE WHEN j + 1 - i = 1 THEN 2.0
                                ELSE 1e18 END),
               bp := CAST(i AS INT))))
         )[1])
  FROM dp WHERE j < length(s)
),
fin AS (SELECT doc_id, s, lat FROM dp WHERE j = length(s)),
bt AS (
  SELECT doc_id, s, lat, CAST(length(s) AS INT) AS pos,
         []::VARCHAR[] AS toks
  FROM fin
  UNION ALL
  SELECT doc_id, s, lat, struct_extract(lat[pos + 1], 'bp'),
         list_prepend(substr(s, struct_extract(lat[pos + 1], 'bp') + 1,
                             pos - struct_extract(lat[pos + 1], 'bp')),
                      toks)
  FROM bt WHERE pos > 0
),
-- SentencePiece-unigram replica (unigram_tokenize_df): the WHOLE-TEXT
-- dp over the ▁-marked string (the engine runs the per-word
-- decomposition, equal by ▁ boundary forcing); same (cost, bp) tie
-- rule, unknown single chars at max(cost)+10 = 12.6. The fixture
-- texts have single internal spaces only, so _spm_pretokenize's
-- squeeze/trim are identity and the marking is one replace
ut AS (
  SELECT doc_id,
         ({_sql_strs(_UG_WORDS)})[CAST(doc_id % 8 + 1 AS INT)]
         || ' ' ||
         ({_sql_strs(_UG_WORDS)})[CAST((doc_id // 8) % 8 + 1 AS INT)]
         || CASE WHEN doc_id % 5 = 0 THEN 'z' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' z' ELSE '' END AS raw
  FROM documents
),
um AS (
  SELECT doc_id, '▁' || replace(raw, ' ', '▁') AS s FROM ut
),
udp AS (
  SELECT doc_id, s, 0 AS j,
         [struct_pack(cost := 0.0::DOUBLE, bp := CAST(-1 AS INT))] AS lat
  FROM um
  UNION ALL
  SELECT doc_id, s, j + 1,
         list_append(lat, (
           list_sort(list_transform(
             generate_series(CASE WHEN j - 2 > 0 THEN j - 2 ELSE 0 END, j),
             i -> struct_pack(
               cost := struct_extract(lat[CAST(i AS INT) + 1], 'cost')
                       + COALESCE(
                           map_extract(
                             map({_sql_strs([p for p, _ in _UG_VOCAB])},
                                 [{",".join(repr(c) + "::DOUBLE"
                                            for _, c in _UG_VOCAB)}]),
                             substr(s, CAST(i AS INT) + 1,
                                    j + 1 - CAST(i AS INT)))[1],
                           CASE WHEN j + 1 - i = 1
                                THEN {_UG_UNK!r}::DOUBLE
                                ELSE 1e18 END),
               bp := CAST(i AS INT))))
         )[1])
  FROM udp WHERE j < length(s)
),
ufin AS (SELECT doc_id, s, lat FROM udp WHERE j = length(s)),
ubt AS (
  SELECT doc_id, s, lat, CAST(length(s) AS INT) AS pos,
         []::VARCHAR[] AS toks
  FROM ufin
  UNION ALL
  SELECT doc_id, s, lat, struct_extract(lat[pos + 1], 'bp'),
         list_prepend(substr(s, struct_extract(lat[pos + 1], 'bp') + 1,
                             pos - struct_extract(lat[pos + 1], 'bp')),
                      toks)
  FROM ubt WHERE pos > 0
),
-- FULL Kuromoji cost-model replica (lexicon_segment_lattice): dp over
-- positions x classes; per (j, t) the candidate min runs over window
-- words of class t AND prev classes (pc = dp + conn, arrive = wc + pc —
-- the engine's exact IEEE association); ties by (cost, bpi, bpc) then
-- (pc, pk) ascending, matching array_min's struct order
ldp AS (
  SELECT doc_id, s, 0 AS j, [[$L_INIT$]] AS lat
  FROM t
  UNION ALL
  SELECT doc_id, s, j + 1,
         list_append(lat, list_transform(generate_series(0, $NC1$), t ->
           (list_sort(list_transform(
             generate_series(CASE WHEN j - 2 > 0 THEN j - 2 ELSE 0 END, j),
             i -> (list_transform(
               [COALESCE(map_extract($L_WMAP$,
                          substr(s, CAST(i AS INT) + 1,
                                 j + 1 - CAST(i AS INT)))[1],
                         CASE WHEN j + 1 - i = 1
                              THEN {{'c': 2.0::DOUBLE, 'k': $UNKI$}} END)],
               we -> CASE WHEN we IS NULL OR we.k <> t
                 THEN {{'cost': 1e18::DOUBLE, 'bpi': CAST(i AS INT),
                       'bpc': CAST(-1 AS INT)}}
                 ELSE (list_transform(
                   [CASE WHEN i = 0
                         THEN {{'pc': ($L_BOS$)[CAST(t AS INT) + 1],
                               'pk': CAST(-1 AS INT)}}
                         ELSE (list_sort(list_transform(
                           generate_series(0, $NC1$),
                           p -> {{'pc': struct_extract(
                                   lat[CAST(i AS INT) + 1][CAST(p AS INT) + 1],
                                   'cost')
                                 + ($L_CONN$)[CAST(t AS INT) + 1]
                                              [CAST(p AS INT) + 1],
                                'pk': CAST(p AS INT)}})))[1] END],
                   pv -> {{'cost': we.c + pv.pc, 'bpi': CAST(i AS INT),
                          'bpc': pv.pk}}))[1]
                 END))[1])))[1]))
  FROM ldp WHERE j < length(s)
),
lfin AS (SELECT doc_id, s, lat FROM ldp WHERE j = length(s)),
lend AS (
  SELECT doc_id, s, lat,
         struct_extract((list_sort(list_transform(
           generate_series(0, $NC1$),
           t -> {{'ec': struct_extract(lat[length(s) + 1][CAST(t AS INT) + 1],
                                      'cost')
                       + ($L_EOS$)[CAST(t AS INT) + 1],
                 'k': CAST(t AS INT)}})))[1], 'k') AS k0
  FROM lfin
),
lbt AS (
  SELECT doc_id, s, lat, CAST(length(s) AS INT) AS pos, k0 AS k,
         []::STRUCT(token VARCHAR, cls VARCHAR)[] AS toks
  FROM lend
  UNION ALL
  SELECT doc_id, s, lat,
         struct_extract(lat[pos + 1][k + 1], 'bpi'),
         struct_extract(lat[pos + 1][k + 1], 'bpc'),
         list_prepend(
           {{'token': substr(s, struct_extract(lat[pos + 1][k + 1], 'bpi') + 1,
                            pos - struct_extract(lat[pos + 1][k + 1], 'bpi')),
            'cls': ($L_CLS$)[k + 1]}},
           toks)
  FROM lbt WHERE pos > 0
)
SELECT doc_id, 'plain' AS part, CAST(o - 1 AS INT) AS tok_idx,
       tok AS token, CAST(NULL AS VARCHAR) AS cls
FROM (SELECT doc_id,
             unnest(toks) AS tok,
             unnest(generate_series(1, len(toks))) AS o
      FROM bt WHERE pos = 0)
UNION ALL
SELECT doc_id, 'lattice', CAST(o - 1 AS INT),
       struct_extract(tk, 'token'), struct_extract(tk, 'cls')
FROM (SELECT doc_id,
             unnest(toks) AS tk,
             unnest(generate_series(1, len(toks))) AS o
      FROM lbt WHERE pos = 0)
UNION ALL
-- part='join': the broadcast-join form is answer-identical to the
-- plain dp by construction; gating it re-uses the same replica
SELECT doc_id, 'join', CAST(o - 1 AS INT), tok, CAST(NULL AS VARCHAR)
FROM (SELECT doc_id,
             unnest(toks) AS tok,
             unnest(generate_series(1, len(toks))) AS o
      FROM bt WHERE pos = 0)
UNION ALL
SELECT doc_id, 'unigram', CAST(o - 1 AS INT), tok, CAST(NULL AS VARCHAR)
FROM (SELECT doc_id,
             unnest(toks) AS tok,
             unnest(generate_series(1, len(toks))) AS o
      FROM ubt WHERE pos = 0)
"""


# inline the lattice fixture's class/connection data into the oracle —
# generated from the SAME constants the Spark query uses
_L_CLASSES = sorted(set(_SEG_CLS.values()) | {"UNK"})
_L_CI = {c: i for i, c in enumerate(_L_CLASSES)}
ORACLES["lexicon_segment"] = (
    ORACLES["lexicon_segment"]
    .replace("$NC1$", str(len(_L_CLASSES) - 1))
    .replace("$UNKI$", str(_L_CI["UNK"]))
    .replace("$L_INIT$", ",".join(
        "{'cost': 0.0::DOUBLE, 'bpi': CAST(-1 AS INT),"
        " 'bpc': CAST(-1 AS INT)}"
        for _ in _L_CLASSES))
    .replace("$L_WMAP$", "map(" + _sql_strs(_SEG_WORDS) + ",[" + ",".join(
        f"{{'c': {float(cost)!r}::DOUBLE, 'k': {_L_CI[_SEG_CLS[w]]}}}"
        for w, cost in _SEG_LEX) + "])")
    .replace("$L_BOS$", "[" + ",".join(
        repr(float(_SEG_CONN.get(("BOS", t), 0.0))) + "::DOUBLE"
        for t in _L_CLASSES) + "]")
    .replace("$L_EOS$", "[" + ",".join(
        repr(float(_SEG_CONN.get((p, "EOS"), 0.0))) + "::DOUBLE"
        for p in _L_CLASSES) + "]")
    .replace("$L_CONN$", "[" + ",".join(
        "[" + ",".join(repr(float(_SEG_CONN.get((p, t), 0.0))) + "::DOUBLE"
                       for p in _L_CLASSES) + "]"
        for t in _L_CLASSES) + "]")
    .replace("$L_CLS$", _sql_strs(_L_CLASSES)))


# trainable-NER replica (operators/ner_nb, portable fit on doc_id < 400):
# chunk synthesis from the same list literals, 5-feature bag per chunk,
# top-300 vocab (total desc, feature asc), Laplace logP/prior rounded 6dp,
# DECIMAL(18,6) feature fold + prior, argmax (score desc, label asc)
ORACLES["ner_trainable"] = f"""
WITH base AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN ({_sql_strs(_NER_FIRSTS)})[CAST((doc_id // 4) % {len(_NER_FIRSTS)} + 1 AS INT)]
                       || ' ' ||
                       ({_sql_strs(_NER_SURS)})[CAST(((doc_id // 4) // 3) % {len(_NER_SURS)} + 1 AS INT)]
           WHEN 1 THEN ({_sql_strs(_NER_LOCS)})[CAST((doc_id // 4) % {len(_NER_LOCS)} + 1 AS INT)]
           WHEN 2 THEN ({_sql_strs(_NER_STEMS)})[CAST((doc_id // 4) % {len(_NER_STEMS)} + 1 AS INT)]
                       || ' ' ||
                       ({_sql_strs(_NER_SUFS)})[CAST(((doc_id // 4) // 3) % {len(_NER_SUFS)} + 1 AS INT)]
           ELSE ({_sql_strs(_NER_MONTHS)})[CAST((doc_id // 4) % {len(_NER_MONTHS)} + 1 AS INT)]
         END AS chunk,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN 'PERSON' WHEN 1 THEN 'LOCATION'
           WHEN 2 THEN 'ORGANIZATION' ELSE 'DATE' END AS label
  FROM documents
),
feat AS (
  SELECT doc_id, label, chunk,
         ['first=' || lower(tk[1]),
          'last=' || lower(tk[-1]),
          'suf3=' || lower(substr(tk[-1], -3, 3)),
          'shape=' || CASE WHEN regexp_matches(chunk, '^[A-Z]{{2,6}}$')
                           THEN 'acro'
                           WHEN contains(chunk, ' ') THEN 'multi'
                           ELSE 'single' END,
          'nw=' || CAST(len(tk) AS VARCHAR)] AS bag
  FROM (SELECT *, string_split(chunk, ' ') AS tk FROM base)
),
fx AS (SELECT doc_id, label, unnest(bag) AS g FROM feat),
lf AS (SELECT label AS l, g, count(*) AS c FROM fx
       WHERE doc_id < 400 GROUP BY label, g),
vocab AS (SELECT g FROM (SELECT g, sum(c) AS tt FROM lf GROUP BY g
                         ORDER BY tt DESC, g LIMIT 300)),
vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab),
tot AS (SELECT l, CAST(sum(c) AS DOUBLE) AS tot FROM lf GROUP BY l),
prior AS (
  SELECT label AS l,
         round(ln(CAST(count(*) AS DOUBLE)
                  / CAST((SELECT count(*) FROM base WHERE doc_id < 400)
                         AS DOUBLE)), 6) AS pr
  FROM base WHERE doc_id < 400 GROUP BY label
),
lp AS (
  SELECT vo.g, t.l,
         round(ln((CAST(COALESCE(c.c, 0) AS DOUBLE) + CAST(0.5 AS DOUBLE))
                  / (t.tot + CAST(0.5 AS DOUBLE)
                             * (vv.v + CAST(1.0 AS DOUBLE)))), 6) AS lp
  FROM vocab vo CROSS JOIN tot t CROSS JOIN vv
  LEFT JOIN lf c ON c.g = vo.g AND c.l = t.l
),
unk AS (
  SELECT t.l,
         round(ln(CAST(0.5 AS DOUBLE)
                  / (t.tot + CAST(0.5 AS DOUBLE)
                             * (vv.v + CAST(1.0 AS DOUBLE)))), 6) AS lp
  FROM tot t CROSS JOIN vv
),
score AS (
  SELECT f.doc_id, t.l,
         CAST(SUM(CAST(COALESCE(p.lp, u.lp) AS DECIMAL(18,6)))
              AS DOUBLE) + max(pr.pr) AS s
  FROM fx f
  CROSS JOIN (SELECT l FROM tot) t
  LEFT JOIN lp p ON p.g = f.g AND p.l = t.l
  JOIN unk u ON u.l = t.l
  JOIN prior pr ON pr.l = t.l
  GROUP BY f.doc_id, t.l
),
best AS (
  SELECT doc_id, l, s,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, l ASC) AS rn
  FROM score
)
SELECT b.doc_id, b.chunk, b.label,
       max(CASE WHEN w.rn = 1 THEN w.l END) AS pred,
       max(CASE WHEN s.l = 'PERSON' THEN s.s END) + 0.0 AS s_per,
       max(CASE WHEN s.l = 'ORGANIZATION' THEN s.s END) + 0.0 AS s_org,
       max(m.mx_pred) AS mx_pred,
       max(m.s_p) + 0.0 AS mx_sper
FROM base b
JOIN best w ON w.doc_id = b.doc_id
JOIN score s ON s.doc_id = b.doc_id
JOIN mx m ON m.doc_id = b.doc_id
GROUP BY b.doc_id, b.chunk, b.label
"""


def _mx_sum_sql(outcome: str) -> str:
    """One outcome's raw weight accumulator, folded in the EXACT
    left-associative order of the expression scorer: 0.0 + w(bag[1]) +
    ... + w(bag[5]) + prior(0.0). CASE tables generated from the shared
    _mx_weights() dict (absent predicate/outcome = +0)."""
    w = _mx_weights()
    terms = []
    for i in range(1, 6):
        whens = " ".join(
            f"WHEN bag[{i}] = '{p}' THEN CAST({v[outcome]!r} AS DOUBLE)"
            for p, v in sorted(w.items()) if outcome in v)
        terms.append(f"(CASE {whens} ELSE CAST(0.0 AS DOUBLE) END)")
    return ("CAST(0.0 AS DOUBLE) + " + " + ".join(terms) +
            " + CAST(0.0 AS DOUBLE)")


# the maxent arm rides the SAME feat CTE; the >=-cascade argmax is the
# published FIRST-max-in-OUTCOME-order rule (earlier outcome wins ties)
ORACLES["ner_trainable"] = ORACLES["ner_trainable"].replace(
    "best AS (",
    f"""mx AS (
  SELECT doc_id,
         {_mx_sum_sql('PERSON')} AS s_p,
         {_mx_sum_sql('LOCATION')} AS s_l,
         {_mx_sum_sql('ORGANIZATION')} AS s_o,
         {_mx_sum_sql('DATE')} AS s_d,
         CASE WHEN {_mx_sum_sql('PERSON')} >= {_mx_sum_sql('LOCATION')}
               AND {_mx_sum_sql('PERSON')} >= {_mx_sum_sql('ORGANIZATION')}
               AND {_mx_sum_sql('PERSON')} >= {_mx_sum_sql('DATE')}
              THEN 'PERSON'
              WHEN {_mx_sum_sql('LOCATION')} >= {_mx_sum_sql('ORGANIZATION')}
               AND {_mx_sum_sql('LOCATION')} >= {_mx_sum_sql('DATE')}
              THEN 'LOCATION'
              WHEN {_mx_sum_sql('ORGANIZATION')} >= {_mx_sum_sql('DATE')}
              THEN 'ORGANIZATION'
              ELSE 'DATE' END AS mx_pred
  FROM feat
),
best AS (""", 1)


def _beam_sql() -> str:
    """Full SQL replica of the width-3 token beam (maxent_beam_decode),
    unrolled position by position for the fixture's 4-token sentences:
    per-position base sums in the scorer's left-associative feature
    fold order (0 + w= + wl= + wc= + pw= + nw= + prior), the
    per-extension softmax normalizer folded in OUTCOME order, pd rows
    and validity masks generated from the same _beam_weights() /
    _cont_validity tables the engine binds, per-step 9dp rounding, and
    top-3 selection by (score DESC, outcome-index string ASC) — digit
    strings of equal length compare exactly like the engine's
    index-array tie-break."""
    from .operators.maxent import _beam_model_parts
    outcomes, c, pd, (cont_ok, bos_ok) = _beam_model_parts(
        {"outcomes": list(_BEAM_OUTCOMES), "weights": _beam_weights(),
         "correction_constant": 1})
    k = len(outcomes)
    w = _beam_weights()

    def case(col: str, prefix: str, outcome: str) -> str:
        whens = " ".join(
            f"WHEN {col} = '{p[len(prefix):]}' THEN CAST({v[outcome]!r} AS DOUBLE)"
            for p, v in sorted(w.items())
            if p.startswith(prefix) and outcome in v)
        if not whens:
            return "CAST(0.0 AS DOUBLE)"
        return f"(CASE {whens} ELSE CAST(0.0 AS DOUBLE) END)"

    def base(p: int, oi: int) -> str:
        o = outcomes[oi]
        return ("CAST(0.0 AS DOUBLE) + CAST(0.0 AS DOUBLE) + "
                + case(f"wl{p}", "wl=", o) + " + "
                + case(f"wc{p}", "wc=", o) + " + "
                + case(f"pw{p}", "pw=", o) + " + "
                + case(f"nw{p}", "nw=", o) + " + CAST(0.0 AS DOUBLE)")

    def pdcase(oi: int) -> str:
        whens = " ".join(f"WHEN {pi} THEN CAST({pd[pi][oi]!r} AS DOUBLE)"
                         for pi in range(k))
        return f"(CASE prev {whens} END)"

    def shape(p: int) -> str:
        return (f"CASE WHEN regexp_matches(tk[{p}], '^[0-9]+$') THEN 'num' "
                f"WHEN regexp_matches(tk[{p}], '^[A-Z]') THEN 'ic' "
                f"WHEN regexp_matches(tk[{p}], '^[a-z]') THEN 'lc' "
                f"ELSE 'other' END")

    fs, ss, ws_, ls = (_sql_strs(_NER_FIRSTS), _sql_strs(_NER_SURS),
                       _sql_strs(_NER_LOWS), _sql_strs(_NER_LOCS))
    nf, ns, nw_, nl = (len(_NER_FIRSTS), len(_NER_SURS), len(_NER_LOWS),
                       len(_NER_LOCS))
    feat_cols = []
    for p in range(1, 5):
        feat_cols.append(f"lower(tk[{p}]) AS wl{p}")
        feat_cols.append(f"{shape(p)} AS wc{p}")
        pw_src = "'*BOS*'" if p == 1 else f"tk[{p - 1}]"
        nw_src = "'*EOS*'" if p == 4 else f"tk[{p + 1}]"
        feat_cols.append(f"{pw_src} AS pw{p}")
        feat_cols.append(f"{nw_src} AS nw{p}")
    bsum_cols = [f"{base(p, oi)} AS b{p}_{oi}"
                 for p in range(1, 5) for oi in range(k)]
    z = "CAST(0.0 AS DOUBLE) + " + " + ".join(
        f"exp(s_{oi} / 1.0)" for oi in range(k))
    pick_s = "CASE o " + " ".join(
        f"WHEN {oi} THEN s_{oi}" for oi in range(k)) + " END"
    bos_allowed = ",".join(str(oi) for oi in range(k) if bos_ok[oi])
    conds = []
    for oi in range(k):
        allowed = [pi for pi in range(k) if cont_ok[oi][pi]]
        if len(allowed) < k:
            conds.append(
                f"(o <> {oi} OR prev IN ({','.join(map(str, allowed))}))")
    valid = (" AND " + " AND ".join(conds)) if conds else ""
    steps = []
    for p in range(2, 5):
        svec = ", ".join(f"b{p}_{oi} + {pdcase(oi)} AS s_{oi}"
                         for oi in range(k))
        steps.append(f"""e{p} AS (
  SELECT h.doc_id, h.labs, h.sc,
         CAST(substr(h.labs, -1, 1) AS INT) AS prev,
         {svec}
  FROM h{p - 1}t h JOIN bsum b ON b.doc_id = h.doc_id
),
h{p} AS (
  SELECT doc_id, o, labs || CAST(o AS VARCHAR) AS labs,
         sc + round(({pick_s}) / 1.0 - ln({z}), 9) AS sc
  FROM e{p} CROSS JOIN (SELECT unnest([0,1,2,3]) AS o) oo
  WHERE TRUE{valid}
),
h{p}t AS (
  SELECT doc_id, labs, sc FROM
    (SELECT *, row_number() OVER (PARTITION BY doc_id
                                  ORDER BY sc DESC, labs ASC) AS rn
     FROM h{p}) WHERE rn <= 3
)""")
    names = _sql_strs(outcomes)
    tags = " || ' ' || ".join(
        f"({names})[CAST(substr(labs, {p}, 1) AS INT) + 1]"
        for p in range(1, 5))
    # span walk (maxent_beam_spans): unrolled over the 4 positions,
    # carrying (serialized spans, live type, live 1-based start); the
    # serialization 'type:start-end=text' matches the Spark column
    span_steps = []
    for p in range(1, 5):
        tg = f"tg{p}"
        is_start = f"({tg} LIKE '%-start')"
        is_cont = f"({tg} LIKE '%-cont')"
        s_typ = f"substr({tg}, 1, length({tg}) - 6)"
        c_typ = f"substr({tg}, 1, length({tg}) - 5)"
        closed = (
            "CASE WHEN cur IS NULL THEN txt ELSE txt || "
            "(CASE WHEN txt = '' THEN '' ELSE '|' END) || cur || ':' "
            f"|| CAST(cs - 1 AS VARCHAR) || '-' || "
            f"CAST({p} - 1 AS VARCHAR) || '=' || "
            f"array_to_string(tk[cs:{p} - 1], ' ') END")
        keep_cont = f"({is_cont} AND cur IS NOT NULL AND cur = {c_typ})"
        span_steps.append(f"""bs{p} AS (
  SELECT doc_id, labs, tk, tg1, tg2, tg3, tg4,
         CASE WHEN {keep_cont} THEN txt ELSE {closed} END AS txt,
         CASE WHEN {is_start} THEN {s_typ}
              WHEN {keep_cont} THEN cur
              WHEN {is_cont} THEN {c_typ}
              ELSE NULL END AS cur,
         CASE WHEN {is_start} THEN {p}
              WHEN {keep_cont} THEN cs
              WHEN {is_cont} THEN {p}
              ELSE 0 END AS cs
  FROM bs{p - 1})""")
    tg_cols = ", ".join(
        f"({names})[CAST(substr(b.labs, {p}, 1) AS INT) + 1] AS tg{p}"
        for p in range(1, 5))
    span_sql = f"""bs0 AS (
  SELECT b.doc_id, b.labs, t.tk, {tg_cols},
         '' AS txt, CAST(NULL AS VARCHAR) AS cur, 0 AS cs
  FROM beam b JOIN btoks t ON t.doc_id = b.doc_id),
{','.join(span_steps)},
bspan AS (
  SELECT doc_id,
         CASE WHEN cur IS NULL THEN txt ELSE txt ||
              (CASE WHEN txt = '' THEN '' ELSE '|' END) || cur || ':'
              || CAST(cs - 1 AS VARCHAR) || '-' || '4' || '=' ||
              array_to_string(tk[cs:4], ' ') END AS spans
  FROM bs4
),
"""
    return f"""btoks AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN [({fs})[CAST(j % {nf} + 1 AS INT)],
                        ({ss})[CAST((j // 3) % {ns} + 1 AS INT)],
                        ({ws_})[CAST(j % {nw_} + 1 AS INT)],
                        ({ls})[CAST((j // 5) % {nl} + 1 AS INT)]]
           WHEN 1 THEN [({ss})[CAST(j % {ns} + 1 AS INT)],
                        ({fs})[CAST((j // 3) % {nf} + 1 AS INT)],
                        ({ws_})[CAST(j % {nw_} + 1 AS INT)],
                        ({ss})[CAST((j // 5) % {ns} + 1 AS INT)]]
           ELSE [({ls})[CAST(j % {nl} + 1 AS INT)],
                 ({ws_})[CAST(j % {nw_} + 1 AS INT)],
                 ({fs})[CAST((j // 3) % {nf} + 1 AS INT)],
                 ({ss})[CAST((j // 5) % {ns} + 1 AS INT)]]
         END AS tk
  FROM (SELECT doc_id, doc_id // 3 AS j FROM documents)
),
bfeat AS (
  SELECT doc_id, {', '.join(feat_cols)}
  FROM btoks
),
bsum AS (
  SELECT doc_id,
         {', '.join(bsum_cols)}
  FROM bfeat
),
h1 AS (
  SELECT doc_id, o, CAST(o AS VARCHAR) AS labs,
         CAST(0.0 AS DOUBLE)
         + round(({pick_s}) / 1.0 - ln({z}), 9) AS sc
  FROM (SELECT doc_id,
               {', '.join(f'b1_{oi} + 0.0 AS s_{oi}' for oi in range(k))}
        FROM bsum)
  CROSS JOIN (SELECT unnest([0,1,2,3]) AS o) oo
  WHERE o IN ({bos_allowed})
),
h1t AS (
  SELECT doc_id, labs, sc FROM
    (SELECT *, row_number() OVER (PARTITION BY doc_id
                                  ORDER BY sc DESC, labs ASC) AS rn
     FROM h1) WHERE rn <= 3
),
{','.join(steps)},
beam AS (
  SELECT doc_id, labs, {tags} AS tags, sc
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY sc DESC, labs ASC) AS rn
        FROM h4t) WHERE rn = 1
),
{span_sql}"""


ORACLES["ner_trainable"] = ORACLES["ner_trainable"].replace(
    "best AS (", _beam_sql() + "best AS (", 1)
ORACLES["ner_trainable"] = ORACLES["ner_trainable"].replace(
    """       max(m.mx_pred) AS mx_pred,
       max(m.s_p) + 0.0 AS mx_sper
FROM base b""",
    """       max(m.mx_pred) AS mx_pred,
       max(m.s_p) + 0.0 AS mx_sper,
       max(bmm.tags) AS beam_tags,
       max(bmm.sc) + 0.0 AS beam_sc,
       max(bsp.spans) AS beam_spans
FROM base b
JOIN beam bmm ON bmm.doc_id = b.doc_id
JOIN bspan bsp ON bsp.doc_id = b.doc_id""", 1)

ORACLES["raw_feature_filter"] = """
WITH m AS (
  SELECT CAST(count(l_quantity) AS DOUBLE) / count(*) AS fill_qty,
         CAST(count(CASE WHEN l_quantity > 10 THEN l_quantity END) AS DOUBLE)
           / count(*) AS fill_qty_sparse,
         CAST(count(l_returnflag) AS DOUBLE) / count(*) AS fill_flag,
         CAST(SUM(CASE WHEN l_quantity IS NOT NULL THEN 1 ELSE 0 END)
              AS DOUBLE) / count(*) AS c_complete,
         CAST(count(DISTINCT l_orderkey) AS DOUBLE) / count(*) AS c_unique,
         CAST(SUM(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.1
                  THEN 1 ELSE 0 END) AS DOUBLE)
           / SUM(CASE WHEN l_discount IS NOT NULL THEN 1 ELSE 0 END)
           AS c_range,
         CAST(SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END)
              AS DOUBLE)
           / SUM(CASE WHEN l_returnflag IS NOT NULL THEN 1 ELSE 0 END)
           AS c_allowed,
         CAST(SUM(CASE WHEN COALESCE(l_quantity > 0, FALSE)
                  THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS c_pos
  FROM lineitem
)
SELECT 'fill' AS part, 'fill_qty' AS name, fill_qty AS metric,
       CAST(NULL AS DOUBLE) AS threshold, CAST(NULL AS BOOLEAN) AS passed
FROM m
UNION ALL SELECT 'fill', 'fill_qty_sparse', fill_qty_sparse,
       CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN) FROM m
UNION ALL SELECT 'fill', 'fill_flag', fill_flag,
       CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN) FROM m
UNION ALL SELECT 'expect', 'complete(l_quantity)', c_complete, 1.0,
       c_complete >= 1.0 FROM m
UNION ALL SELECT 'expect', 'unique(l_orderkey)', c_unique, 1.0,
       c_unique >= 1.0 FROM m
UNION ALL SELECT 'expect', 'in_range(l_discount,0.0,0.1)', c_range, 0.95,
       COALESCE(c_range >= 0.95, TRUE) FROM m
UNION ALL SELECT 'expect', 'allowed_values(l_returnflag)', c_allowed, 1.0,
       COALESCE(c_allowed >= 1.0, TRUE) FROM m
UNION ALL SELECT 'expect', 'qty_positive', c_pos, 1.0, c_pos >= 1.0 FROM m
"""

ORACLES["numeric_fitted"] = """
WITH m AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) / count(o_totalprice) AS mu,
         CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           / count(o_totalprice) AS m2,
         quantile_cont(o_totalprice, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
  FROM orders
), s AS (
  SELECT mu, sqrt(m2 - mu * mu) AS sigma, qs FROM m
)
SELECT o_orderkey,
       round((o_totalprice - s.mu) / s.sigma, 6) AS price_scaled,
       COALESCE(o_totalprice, s.mu) AS price_imputed,
       CAST(CASE WHEN o_totalprice < 100000 THEN 0
                 WHEN o_totalprice < 200000 THEN 1
                 WHEN o_totalprice < 300000 THEN 2
                 ELSE 3 END AS BIGINT) AS price_bucket,
       CAST(len(list_filter(s.qs, q -> o_totalprice >= q)) AS BIGINT) AS price_decile
FROM orders, s
"""

_AUROC_SQL = """
WITH g AS (
  SELECT o_totalprice AS s, count(*) AS n,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS np
  FROM orders GROUP BY o_totalprice
), r AS (
  SELECT n, np,
         COALESCE(SUM(n) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS below
  FROM g
)
SELECT CAST(SUM((2 * below + n + 1) * np) - SUM(np) * (SUM(np) + 1) AS DOUBLE)
       / (2.0 * SUM(np) * SUM(n - np)) AS auroc
FROM r
"""

_CONFUSION_SQL = """
SELECT CAST(SUM(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
FROM (
  SELECT o_totalprice / 1000000.0 AS s,
         CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
         CASE WHEN o_totalprice / 1000000.0 >= 0.15 THEN 1 ELSE 0 END AS pred
  FROM orders
)
"""

# one-row frames compose by cross join (column sets are disjoint)
ORACLES["correlation_stats"] = (
    f"SELECT * FROM ({_SPEARMAN_SQL}) sp CROSS JOIN ({_CRAMERS_SQL}) cv")

# OpMultiClassificationEvaluator: macro P/R/F1 + top-N correctness over the
# same deterministic 3-class scores as q_binary_eval (integer arithmetic ->
# identical rank order in both engines; hit counts are exact integers)
_MULTICLASS_SQL = """
WITH mc AS (
  SELECT CASE o_orderstatus WHEN 'F' THEN 0.0 WHEN 'O' THEN 1.0
         ELSE 2.0 END AS my,
         [ CAST((o_orderkey * 7) % 100 AS DOUBLE) / 100.0,
           CAST((o_orderkey * 13 + 3) % 100 AS DOUBLE) / 100.0,
           CAST((o_orderkey * 29 + 7) % 100 AS DOUBLE) / 100.0 ] AS probs
  FROM orders
), mp AS (
  SELECT my, probs,
         CASE WHEN probs[1] >= probs[2] AND probs[1] >= probs[3] THEN 0.0
              WHEN probs[2] >= probs[3] THEN 1.0 ELSE 2.0 END AS mpred,
         probs[CAST(my AS INT) + 1] AS label_p
  FROM mc
), per_class AS (
  SELECT my AS cls, COUNT(*) AS support,
         SUM(CASE WHEN mpred = my THEN 1 ELSE 0 END) AS tp
  FROM mp GROUP BY my
), pred_counts AS (
  SELECT mpred AS cls, COUNT(*) AS pred_n FROM mp GROUP BY mpred
), pc AS (
  SELECT support, tp, COALESCE(pred_n, 0) AS pred_n,
         CASE WHEN COALESCE(pred_n, 0) > 0
              THEN CAST(tp AS DOUBLE) / pred_n ELSE 0.0 END AS prec,
         CASE WHEN support > 0
              THEN CAST(tp AS DOUBLE) / support ELSE 0.0 END AS rec
  FROM per_class LEFT JOIN pred_counts USING (cls)
), macro AS (
  SELECT CAST(SUM(tp) AS BIGINT) AS n_correct,
         CAST(SUM(support) AS BIGINT) AS n_rows,
         ROUND(AVG(prec), 6) AS macro_precision6,
         ROUND(AVG(rec), 6) AS macro_recall6,
         ROUND(AVG(CASE WHEN prec + rec > 0
                   THEN 2 * prec * rec / (prec + rec)
                   ELSE 0.0 END), 6) AS macro_f16
  FROM pc
), tops AS (
  SELECT CAST(SUM(CASE WHEN label_p >= list_sort(probs, 'DESC')[1]
                  THEN 1 ELSE 0 END) AS BIGINT) AS top1_hits,
         CAST(SUM(CASE WHEN label_p >= list_sort(probs, 'DESC')[3]
                  THEN 1 ELSE 0 END) AS BIGINT) AS top3_hits
  FROM mp
)
SELECT * FROM macro CROSS JOIN tops
"""

_BIN_SCORE_SQL = """
SELECT CAST(least(floor(o_totalprice / 600000.0 * 10), 9) AS BIGINT) AS bin,
       count(*) AS n,
       CAST(SUM(CAST(o_totalprice / 600000.0 AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS avg_score,
       CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END
                AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS rate
FROM orders
GROUP BY least(floor(o_totalprice / 600000.0 * 10), 9)
"""

ORACLES["binary_eval"] = (
    f"SELECT * FROM ({_BIN_SCORE_SQL}) bs "
    f"CROSS JOIN ({_CONFUSION_SQL}) cm CROSS JOIN ({_AUROC_SQL}) au "
    f"CROSS JOIN ({_MULTICLASS_SQL}) mu")

# mirror of operators/categorical._MAGIC offset rules: the CASE is GENERATED
# from the same table (same priority order, same offsets), so the oracle
# cannot drift from the Spark expression.
def _mime_case_sql() -> str:
    from .operators.categorical import _MAGIC
    whens = []
    for mime, parts in _MAGIC:
        conds = " AND ".join(
            f"substr(hx, {2 * off + 1}, {2 * len(magic)}) = '{magic.hex().upper()}'"
            for off, magic in parts)
        whens.append(f"WHEN {conds} THEN '{mime}'")
    return "CASE " + "\n            ".join(whens) + \
        " ELSE 'application/octet-stream' END"


def _cs_case_sql():
    """CASE mapping one hex pair through the per-class vowel->high-byte
    maps (_CS_MAPS) — identical to the Spark fixture's map_pair."""
    arms = []
    for ci, mp in enumerate(_CS_MAPS):
        inner = " ".join(f"WHEN '{k}' THEN '{v}'"
                         for k, v in sorted(mp.items()))
        arms.append(f"WHEN {ci} THEN CASE substr(hx, i*2-1, 2) {inner} "
                    f"ELSE substr(hx, i*2-1, 2) END")
    return "CASE cls " + " ".join(arms) + " END"


# mime rules + trainable-charset replica (operators/charset_nb, portable
# fit on p_partkey < 400): vowel-byte mapped payloads, byte-bigram bags
# (4-hex-char windows at odd offsets), top-300 vocab (total desc, gram
# asc), Laplace logP/prior rounded 6dp, DECIMAL(18,6) fold + prior,
# argmax (score desc, label asc) — the ner_trainable oracle skeleton
ORACLES["mime_detector"] = f"""
WITH payload AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 3 = 0 THEN '89504E470D0A1A0A' || hex(encode(p_name))
              WHEN p_partkey % 3 = 1 THEN 'FFD8FFE0' || hex(encode(p_name))
              ELSE hex(encode(p_name)) END AS hx
  FROM part
),
src AS (SELECT p_partkey, CAST(p_partkey % 3 AS INT) AS cls,
               hex(encode(p_name)) AS hx
        FROM part),
mapped AS (
  SELECT p_partkey,
         ({_sql_strs(_CS_CLASSES)})[cls + 1] AS enc,
         array_to_string(list_transform(
           generate_series(1, CAST(length(hx) // 2 AS INT)),
           i -> {_cs_case_sql()}), '') AS mhx
  FROM src
),
bg AS (
  SELECT p_partkey, enc,
         unnest(list_transform(
           generate_series(1, CAST(length(mhx) // 2 - 1 AS INT)),
           i -> substr(mhx, i*2-1, 4))) AS g
  FROM mapped WHERE length(mhx) >= 4
),
clf AS (SELECT enc AS l, g, count(*) AS c FROM bg
        WHERE p_partkey < 400 GROUP BY enc, g),
cvocab AS (SELECT g FROM (SELECT g, sum(c) AS tt FROM clf GROUP BY g
                          ORDER BY tt DESC, g LIMIT 300)),
cvv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM cvocab),
ctot AS (SELECT l, CAST(sum(c) AS DOUBLE) AS tot FROM clf GROUP BY l),
cprior AS (
  SELECT enc AS l,
         round(ln(CAST(count(*) AS DOUBLE)
                  / CAST((SELECT count(*) FROM mapped
                          WHERE p_partkey < 400) AS DOUBLE)), 6) AS pr
  FROM mapped WHERE p_partkey < 400 GROUP BY enc
),
clp AS (
  SELECT vo.g, t.l,
         round(ln((CAST(COALESCE(c.c, 0) AS DOUBLE) + CAST(0.5 AS DOUBLE))
                  / (t.tot + CAST(0.5 AS DOUBLE)
                             * (cvv.v + CAST(1.0 AS DOUBLE)))), 6) AS lp
  FROM cvocab vo CROSS JOIN ctot t CROSS JOIN cvv
  LEFT JOIN clf c ON c.g = vo.g AND c.l = t.l
),
cunk AS (
  SELECT t.l,
         round(ln(CAST(0.5 AS DOUBLE)
                  / (t.tot + CAST(0.5 AS DOUBLE)
                             * (cvv.v + CAST(1.0 AS DOUBLE)))), 6) AS lp
  FROM ctot t CROSS JOIN cvv
),
cscore AS (
  SELECT b.p_partkey, t.l,
         CAST(SUM(CAST(COALESCE(p.lp, u.lp) AS DECIMAL(18,6)))
              AS DOUBLE) + max(pr.pr) AS s
  FROM bg b
  CROSS JOIN (SELECT l FROM ctot) t
  LEFT JOIN clp p ON p.g = b.g AND p.l = t.l
  JOIN cunk u ON u.l = t.l
  JOIN cprior pr ON pr.l = t.l
  GROUP BY b.p_partkey, t.l
),
cbest AS (
  SELECT p_partkey, l,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY s DESC, l ASC) AS rn
  FROM cscore
),
-- r10 media-CONTENT replicas: the EXPECTED dHash / energy signature
-- computed directly from the same p_partkey byte formulas the Spark
-- side synthesizes its real BMP/WAV blobs from — grid sampling
-- (px=gx, py=gy at 9x8), bottom-up vs top-down row order by key
-- parity, B+G+R gray fold, and the 16-bin / 4-bit thermometer with
-- integer threshold tests; bit 63 is the BIGINT sign (simhash trick)
bmpg AS (
  SELECT p.p_partkey, gy.gy, gx.gx,
         CASE WHEN p.p_partkey % 2 = 0 THEN 7 - gy.gy
              ELSE gy.gy END AS rw
  FROM part p, range(0, 8) gy(gy), range(0, 8) gx(gx)
),
bmpb AS (
  SELECT p_partkey, gy, gx,
         ((p_partkey*7 + (rw*28 + gx*3 + 0)*13) % 256
          + (p_partkey*7 + (rw*28 + gx*3 + 1)*13) % 256
          + (p_partkey*7 + (rw*28 + gx*3 + 2)*13) % 256) AS g0,
         ((p_partkey*7 + (rw*28 + (gx+1)*3 + 0)*13) % 256
          + (p_partkey*7 + (rw*28 + (gx+1)*3 + 1)*13) % 256
          + (p_partkey*7 + (rw*28 + (gx+1)*3 + 2)*13) % 256) AS g1
  FROM bmpg
),
bmph AS (
  SELECT p_partkey,
         CAST(SUM(CASE WHEN g0 > g1 THEN
             CASE WHEN gy*8 + gx = 63
                  THEN CAST(-9223372036854775808 AS BIGINT)
                  ELSE (1::BIGINT << (gy*8 + gx)) END
           ELSE 0 END) AS BIGINT) AS bmp_hash
  FROM bmpb GROUP BY p_partkey
),
wavu AS (
  SELECT p_partkey, b,
         SUM(CASE WHEN u >= 32768 THEN 65536 - u ELSE u END) AS e
  FROM (SELECT p.p_partkey, b.b AS b,
               (p.p_partkey*31 + (b.b*8 + j.j)*37) % 65536 AS u
        FROM part p, range(0, 16) b(b), range(0, 8) j(j))
  GROUP BY p_partkey, b
),
wavs AS (
  SELECT p_partkey,
         CAST(SUM(CASE WHEN bit THEN
             CASE WHEN idx = 63
                  THEN CAST(-9223372036854775808 AS BIGINT)
                  ELSE (1::BIGINT << idx) END
           ELSE 0 END) AS BIGINT) AS wav_sig
  FROM (
    SELECT wb.p_partkey, wb.b*4 + t.t AS idx,
           CASE t.t WHEN 0 THEN wb.e*32 > wt.tot
                    WHEN 1 THEN wb.e*16 > wt.tot
                    WHEN 2 THEN wb.e*32 > wt.tot*3
                    ELSE wb.e*8 > wt.tot END AS bit
    FROM wavu wb
    JOIN (SELECT p_partkey, SUM(e) AS tot FROM wavu
          GROUP BY p_partkey) wt USING (p_partkey)
    CROSS JOIN range(0, 4) t(t)
  ) GROUP BY p_partkey
)
SELECT payload.p_partkey,
       {_mime_case_sql()} AS mime,
       m.enc AS charset_label,
       (SELECT b.l FROM cbest b
        WHERE b.p_partkey = payload.p_partkey AND b.rn = 1) AS charset_pred,
       bmph.bmp_hash, wavs.wav_sig
FROM payload JOIN mapped m ON m.p_partkey = payload.p_partkey
             JOIN bmph ON bmph.p_partkey = payload.p_partkey
             JOIN wavs ON wavs.p_partkey = payload.p_partkey
"""

ORACLES["dedup_exact"] = """
SELECT 'full' AS part, md5(text) AS digest,
       CAST(min(doc_id) AS BIGINT) AS representative,
       count(*) AS dup_count
FROM documents GROUP BY md5(text)
UNION ALL
SELECT 'incremental', md5(text), CAST(doc_id AS BIGINT),
       CAST(NULL AS BIGINT)
FROM (SELECT text, doc_id,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY doc_id % 2, doc_id) AS rn
      FROM documents) t
WHERE rn = 1
"""

ORACLES["dedup_clusters"] = f"""
WITH t AS (SELECT doc_id, {_tokens('text')} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(list_slice(toks, i, i + 2), ' '))
           ELSE [] END)) AS sh
  FROM t
),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
freq AS (SELECT sh FROM g GROUP BY sh HAVING count(*) <= 200),
gc AS (SELECT g.doc_id, g.sh FROM g JOIN freq USING (sh)),
p AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
  FROM gc a JOIN gc b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id1, id2 FROM p JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
  WHERE CAST(common AS DOUBLE) / CAST(s1.n + s2.n - common AS DOUBLE) >= 0.3
),
edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
          UNION SELECT id2, id1 FROM pairs),
reach AS (
  WITH RECURSIVE r(node, lbl) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, r.lbl FROM edges e JOIN r ON e.dst = r.node
  )
  SELECT node, min(lbl) AS cluster_id FROM r GROUP BY node
),
-- exact-substring span dedup: every 8-token window hashed (portable md5
-- int60), keep-first by (doc, pos), other occurrences -> cut starts,
-- merged per doc by the running-max-end interval coalesce
sp AS (
  SELECT doc_id, i,
         CAST(('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')),
                              1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
        FROM t WHERE len(toks) >= 8)
),
spr AS (
  SELECT doc_id, i,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
  FROM sp
),
spc AS (SELECT doc_id, i - 1 AS s, i - 1 + 8 AS e FROM spr WHERE rn > 1),
spm AS (
  SELECT doc_id, s, e,
         CASE WHEN s <= COALESCE(max(e) OVER (PARTITION BY doc_id
                ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), -1)
              THEN 0 ELSE 1 END AS brk
  FROM spc
),
spg AS (
  SELECT doc_id, s, e,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
  FROM spm
)
SELECT 'pair' AS part, CAST(id1 AS BIGINT) AS a, CAST(id2 AS BIGINT) AS b,
       CAST(common AS BIGINT) AS common,
       CAST(common AS DOUBLE) / CAST(s1.n + s2.n - common AS DOUBLE) AS jaccard
FROM p JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
WHERE CAST(common AS DOUBLE) / CAST(s1.n + s2.n - common AS DOUBLE) >= 0.3
UNION ALL
SELECT 'cluster', CAST(node AS BIGINT), CAST(cluster_id AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM reach
UNION ALL
SELECT 'span', CAST(doc_id AS BIGINT), CAST(min(s) AS BIGINT),
       CAST(max(e) AS BIGINT), CAST(NULL AS DOUBLE)
FROM spg GROUP BY doc_id, gid
UNION ALL
-- editdist: brute-force all-pairs Levenshtein over distinct part names
-- (entity id = min p_partkey). The Spark side uses PassJoin pigeonhole
-- blocking; matching this blocking-free oracle proves the blocking's
-- completeness. The length band is a theorem (|len diff| <= edit dist),
-- not a heuristic.
SELECT 'editdist', CAST(a.pid AS BIGINT), CAST(b.pid AS BIGINT),
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT), CAST(NULL AS DOUBLE)
FROM (SELECT min(p_partkey) AS pid, p_name FROM part GROUP BY p_name) a
JOIN (SELECT min(p_partkey) AS pid, p_name FROM part GROUP BY p_name) b
  ON a.pid < b.pid
 AND abs(length(a.p_name) - length(b.p_name)) <= 3
 AND levenshtein(a.p_name, b.p_name) <= 3
"""

_SW = {k: "[" + ",".join(f"'{w}'" for w in v) + "]"
       for k, v in textqual.STOPWORD_PROFILES.items()}
_BPE = r"[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]"

# -- web preprocessing SQL mirror (llm/web.py) ------------------------------
# Generated DuckDB SQL replicating extract/boilerplate/canonicalize
# op-for-op: every regexp_replace ('g'!), the entity replace chain in
# order, the block split + link-density division, and the URL rewrite.


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _web_fixture_sql() -> tuple[str, str]:
    """DuckDB expressions rebuilding q_text_quality's HTML/URL fixtures
    byte-for-byte from documents columns."""
    html_expr = (f"{_sql_lit(_WEB_HTML[0])} || source || "
                 f"{_sql_lit(_WEB_HTML[1])} || text || "
                 f"{_sql_lit(_WEB_HTML[2])} || lang || "
                 f"{_sql_lit(_WEB_HTML[3])} || source || "
                 f"{_sql_lit(_WEB_HTML[4])}")
    url_expr = (f"{_sql_lit(_WEB_URL[0])} || CAST(doc_id AS VARCHAR) || "
                f"{_sql_lit(_WEB_URL[1])} || source || "
                f"{_sql_lit(_WEB_URL[2])}")
    return html_expr, url_expr


def _web_btext_sql(x: str) -> str:
    from .llm.web import ENTITY_PAIRS
    t = f"regexp_replace({x}, '(?s)<[^>]*>', ' ', 'g')"
    for s, d in ENTITY_PAIRS:
        t = f"replace({t}, {_sql_lit(s)}, {_sql_lit(d)})"
    t = rf"regexp_replace({t}, '\s+', ' ', 'g')"
    return f"trim({t})"


def _web_cte_sql() -> str:
    from .llm.web import _TWO_LEVEL_SLD, BLOCK_TAGS, TRACKING_PARAMS
    block_re = _sql_lit(r"(?i)</?(?:%s)\b[^>]*>" % BLOCK_TAGS)
    noise = "html"
    noise = f"regexp_replace({noise}, '(?s)<!--.*?-->', ' ', 'g')"
    noise = (rf"regexp_replace({noise}, "
             rf"'(?is)<script\b[^>]*>.*?</script>', ' ', 'g')")
    noise = (rf"regexp_replace({noise}, "
             rf"'(?is)<style\b[^>]*>.*?</style>', ' ', 'g')")
    anchors = rf"regexp_extract_all(b, '(?is)<a\b[^>]*>(.*?)</a>', 1)"
    alen = (f"COALESCE(list_sum(list_transform({anchors}, "
            f"a -> length({_web_btext_sql('a')}))), 0)")
    bt = _web_btext_sql("b")
    ld = (f"CASE WHEN length({bt}) > 0 THEN CAST({alen} AS DOUBLE) / "
          f"CAST(length({bt}) AS DOUBLE) ELSE 0.0 END")
    blocks = (f"list_filter(list_transform(regexp_split_to_array({noise}, "
              f"{block_re}), b -> struct_pack(txt := {bt}, ld := {ld})), "
              f"s -> s.txt <> '')")
    u = "regexp_replace(trim(url), '(?s)#.*', '')"
    scheme = (rf"lower(regexp_extract({u}, "
              rf"'^([A-Za-z][A-Za-z0-9+.\-]*)://', 1))")
    rest = rf"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.\-]*://', '')"
    auth = f"lower(regexp_extract({rest}, '^([^/?#]*)', 1))"
    auth2 = (f"CASE WHEN {scheme} = 'http' "
             f"THEN regexp_replace({auth}, ':80$', '') "
             f"WHEN {scheme} = 'https' "
             f"THEN regexp_replace({auth}, ':443$', '') ELSE {auth} END")
    pathq = f"regexp_replace({rest}, '^[^/?#]*', '')"
    path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    path2 = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = rf"regexp_extract({pathq}, '(?s)\?(.*)', 1)"
    name = "lower(regexp_extract(p, '^([^=]*)', 1))"
    tracking = "[" + ", ".join(_sql_lit(t) for t in TRACKING_PARAMS) + "]"
    params = (f"list_filter(string_split({query}, '&'), p -> p <> '' AND "
              f"NOT starts_with({name}, 'utm_') AND "
              f"NOT list_contains({tracking}, {name}))")
    q2 = f"array_to_string(list_sort({params}), '&')"
    canon = (f"{scheme} || '://' || {auth2} || {path2} || "
             f"(CASE WHEN {q2} = '' THEN '' ELSE '?' || {q2} END)")
    host = f"regexp_extract({auth}, '^(?:[^@]*@)?([^:]*)', 1)"
    sld = "[" + ", ".join(_sql_lit(s) for s in _TWO_LEVEL_SLD) + "]"
    lb = f"string_split({host}, '.')"
    dom = (f"array_to_string(CASE WHEN len({lb}) >= 3 AND "
           f"length({lb}[len({lb})]) = 2 AND "
           f"list_contains({sld}, {lb}[len({lb}) - 1]) "
           f"THEN list_slice({lb}, len({lb}) - 2, len({lb})) "
           f"WHEN len({lb}) >= 2 "
           f"THEN list_slice({lb}, len({lb}) - 1, len({lb})) "
           f"ELSE {lb} END, '.')")
    html_expr, url_expr = _web_fixture_sql()
    return f"""web AS (
  SELECT doc_id, canon_url, url_dom,
         md5(array_to_string(list_transform(kept, s -> s.txt), chr(10)))
           AS web_md5,
         CAST(len(blocks) AS BIGINT) AS n_blocks,
         CAST(len(kept) AS BIGINT) AS n_kept
  FROM (
    SELECT doc_id, canon_url, url_dom, blocks,
           list_filter(blocks,
                       s -> length(s.txt) >= 10 AND s.ld <= 0.5) AS kept
    FROM (
      SELECT doc_id, {canon} AS canon_url, {dom} AS url_dom,
             {blocks} AS blocks
      FROM (SELECT doc_id, {html_expr} AS html, {url_expr} AS url
            FROM documents)
    )
  )
),
"""


def _linkgraph_cte_sql(iters: int = 3, damping: float = 0.85) -> str:
    """DuckDB CTE chain replicating extract_links -> host edges ->
    operators/graph.pagerank(portable=True) for ``iters`` iterations:
    the href regexes (both quote styles), the drop filter, resolve_href's
    4-way CASE, url_host, the weighted edge aggregation, and per
    iteration the round-9dp DECIMAL(29,9) contribution sums, uniform
    dangling redistribution, and the exact double expression
    base + d*(s + dang/n) — all IEEE-op-for-op."""
    html_expr, url_expr = _web_fixture_sql()
    noise = "html"
    noise = f"regexp_replace({noise}, '(?s)<!--.*?-->', ' ', 'g')"
    noise = (rf"regexp_replace({noise}, "
             rf"'(?is)<script\b[^>]*>.*?</script>', ' ', 'g')")
    noise = (rf"regexp_replace({noise}, "
             rf"'(?is)<style\b[^>]*>.*?</style>', ' ', 'g')")
    dq = _sql_lit(r'(?is)<a\b[^>]*?href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>')
    sq = _sql_lit(r"(?is)<a\b[^>]*?href\s*=\s*'([^']*)'[^>]*>(.*?)</a>")
    scheme_re = r"'^([A-Za-z][A-Za-z0-9+.\-]*)://'"
    strip_scheme = rf"regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\-]*://', '')"

    def hostof(x):
        auth = (f"lower(regexp_extract(regexp_replace({x}, "
                f"'^[A-Za-z][A-Za-z0-9+.\\-]*://', ''), '^([^/?#]*)', 1))")
        return (f"CASE WHEN regexp_extract(trim({x}), {scheme_re}, 1) <> '' "
                f"THEN regexp_extract({auth.replace(x, f'trim({x})')}, "
                f"'^(?:[^@]*@)?([^:]*)', 1) ELSE '' END")

    # resolve_href mirror (u = page url, href = trimmed link)
    sch = f"regexp_extract(u, {scheme_re}, 1)"
    auth_raw = f"regexp_extract({strip_scheme}, '^([^/?#]*)', 1)"
    b = "regexp_replace(u, '(?s)[?#].*', '')"
    bdir = (f"CASE WHEN regexp_extract({b}, "
            rf"'^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*$', 0) <> '' "
            f"THEN {b} || '/' ELSE regexp_replace({b}, '[^/]*$', '') END")
    resolved = (
        rf"CASE WHEN regexp_extract(href, '^[A-Za-z][A-Za-z0-9+.\-]*://', 0)"
        f" <> '' THEN href "
        f"WHEN starts_with(href, '//') THEN {sch} || ':' || href "
        f"WHEN starts_with(href, '/') THEN {sch} || '://' || {auth_raw} "
        f"|| href ELSE {bdir} || href END")

    rank_init = ("CAST(1.0 AS DOUBLE) / "
                 "CAST((SELECT n FROM lgc) AS DOUBLE)")
    base_lit = f"CAST({1.0 - damping!r} AS DOUBLE)"
    damp_lit = f"CAST({damping!r} AS DOUBLE)"
    n_dbl = "CAST((SELECT n FROM lgc) AS DOUBLE)"
    iter_ctes = ""
    for i in range(iters):
        iter_ctes += f"""lgd{i} AS (
  SELECT COALESCE(CAST(sum(CAST(round(rank, 9) AS DECIMAL(29,9)))
                       AS DOUBLE), CAST(0 AS DOUBLE)) AS d
  FROM lgr{i} WHERE node NOT IN (SELECT src FROM lgo)
),
lgs{i} AS (
  SELECT f.dst, CAST(sum(CAST(round(r.rank * f.frac, 9)
                              AS DECIMAL(29,9))) AS DOUBLE) AS s
  FROM lgf f JOIN lgr{i} r ON r.node = f.src GROUP BY f.dst
),
lgr{i + 1} AS (
  SELECT n.node,
         {base_lit} / {n_dbl}
         + {damp_lit} * (COALESCE(s.s, CAST(0 AS DOUBLE))
                         + (SELECT d FROM lgd{i}) / {n_dbl}) AS rank
  FROM lgn n LEFT JOIN lgs{i} s ON s.dst = n.node
),
"""
    return f"""lgdoc AS (
  SELECT doc_id, lang, {html_expr} AS html, {url_expr} AS u FROM documents
),
lgl AS (
  SELECT doc_id, u, href FROM (
    SELECT doc_id, u, trim(raw) AS href FROM (
      SELECT doc_id, u, unnest(list_concat(
        regexp_extract_all({noise}, {dq}, 1),
        regexp_extract_all({noise}, {sq}, 1))) AS raw
      FROM lgdoc))
  WHERE href <> '' AND NOT starts_with(href, '#')
    AND regexp_extract(href, '(?i)^(javascript|mailto|tel|data):', 0) = ''
),
lge AS (
  SELECT doc_id, {hostof('u')} AS src, {hostof(f'({resolved})')} AS dst
  FROM lgl
),
lged AS (
  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM lge GROUP BY src, dst
),
lgn AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM lged
                             UNION ALL SELECT dst FROM lged)
),
lgc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lgn),
lgo AS (SELECT src, sum(w) AS outw FROM lged GROUP BY src),
lgf AS (
  SELECT e.src, e.dst, e.w / o.outw AS frac FROM lged e JOIN lgo o USING (src)
),
lgr0 AS (SELECT node, {rank_init} AS rank FROM lgn),
{iter_ctes}lg AS (
  SELECT d.doc_id, COALESCE(cnt.c, 0) AS n_links, r.rank AS hub_rank
  FROM lgdoc d
  LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
             FROM lgl GROUP BY doc_id) cnt USING (doc_id)
  LEFT JOIN lgr{iters} r ON r.node = 'hub-' || d.lang || '.example.com'
),
"""


def _hits_cte_sql(iters: int = 2) -> str:
    """DuckDB CTE chain replicating operators/graph.hits(portable=True)
    over the distinct (source, lang) affiliation edges: per iteration the
    round-9dp DECIMAL(29,9) in-hub / out-authority sums, the L2 norms
    (sqrt of decimal-summed round-9dp squares — IEEE-correctly-rounded in
    both engines), and the normalizing divisions, op-for-op."""
    dec = "DECIMAL(29,9)"
    ctes = """hedges AS (SELECT DISTINCT source AS src, lang AS dst
           FROM documents),
hnodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM hedges
                                      UNION ALL SELECT dst FROM hedges)),
h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub,
              CAST(1.0 AS DOUBLE) AS authority FROM hnodes),
"""
    for i in range(iters):
        ctes += f"""ha{i} AS (
  SELECT n.node, COALESCE(s.a, CAST(0 AS DOUBLE)) AS a
  FROM hnodes n LEFT JOIN (
    SELECT e.dst, CAST(sum(CAST(round(h.hub, 9) AS {dec})) AS DOUBLE) AS a
    FROM hedges e JOIN h{i} h ON h.node = e.src GROUP BY e.dst) s
  ON s.dst = n.node
),
hna{i} AS (
  SELECT sqrt(CAST(sum(CAST(round(a * a, 9) AS {dec})) AS DOUBLE)) AS na
  FROM ha{i}
),
hh{i} AS (
  SELECT n.node, COALESCE(s.h, CAST(0 AS DOUBLE)) AS h, a.a AS a
  FROM hnodes n
  LEFT JOIN (
    SELECT e.src, CAST(sum(CAST(round(a2.a / (SELECT na FROM hna{i}), 9)
                               AS {dec})) AS DOUBLE) AS h
    FROM hedges e JOIN ha{i} a2 ON a2.node = e.dst GROUP BY e.src) s
  ON s.src = n.node
  JOIN ha{i} a ON a.node = n.node
),
hnh{i} AS (
  SELECT sqrt(CAST(sum(CAST(round(h * h, 9) AS {dec})) AS DOUBLE)) AS nh
  FROM hh{i}
),
h{i + 1} AS (
  SELECT node, h / (SELECT nh FROM hnh{i}) AS hub,
         a / (SELECT na FROM hna{i}) AS authority
  FROM hh{i}
),
"""
    ctes += f"""hx AS (
  SELECT d.doc_id, hs.hub AS src_hub, hl.authority AS lang_auth
  FROM documents d
  LEFT JOIN h{iters} hs ON hs.node = d.source
  LEFT JOIN h{iters} hl ON hl.node = d.lang
),
"""
    return ctes


ORACLES["text_quality"] = rf"""
WITH {{web_cte}}{{lg_cte}}{{hits_cte}}base0 AS (
  SELECT doc_id, text, {_tokens('text')} AS toks,
         COALESCE(length(text), 0) AS ln,
         trim(regexp_replace(lower(COALESCE(text, '')),
                             '[^\p{{L}}\p{{N}}]+', ' ', 'g')) AS wnorm
  FROM documents
), grams AS (
  SELECT doc_id, CASE WHEN length(wnorm) >= 5 THEN
           list_transform(range(1, length(wnorm) - 5 + 2),
             i -> CAST('0x' || substr(md5(substr(wnorm, CAST(i AS INT), 5)), 1, 15)
                       AS BIGINT))
         ELSE [] END AS g
  FROM base0
), base AS (
  SELECT b.doc_id, b.text, b.toks, b.ln,
         CASE WHEN len(g.g) >= 4 THEN
           list_distinct(list_transform(range(1, len(g.g) - 4 + 2),
             i -> list_min(list_slice(g.g, CAST(i AS INT), CAST(i AS INT) + 3))))
         ELSE list_distinct(g.g) END AS wins
  FROM base0 b JOIN grams g USING (doc_id)
), m AS (
  SELECT doc_id, text, toks, ln, wins,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(COALESCE(len(regexp_extract_all(text, '{_BPE}')), 0) AS BIGINT) AS n_tokens_bpe,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) END AS mean_token_len,
         CASE WHEN ln = 0 THEN 0.0
              ELSE CAST(length(regexp_replace(text, '[\p{{L}}\p{{N}}\s]', '', 'g')) AS DOUBLE)
                   / CAST(ln AS DOUBLE) END AS punct_ratio,
         CASE WHEN ln = 0 THEN 0.0
              ELSE CAST(ln - length(regexp_replace(text, '[\p{{N}}]', '', 'g')) AS DOUBLE)
                   / CAST(ln AS DOUBLE) END AS digit_ratio,
         {{sw_exprs}},
         CAST(len(wins) AS BIGINT) AS n_winnow_fp
  FROM base
)
SELECT doc_id, CAST(ln AS BIGINT) AS n_chars, n_tokens, n_tokens_bpe, mean_token_len,
       punct_ratio, digit_ratio, s_en AS stopword_ratio_en,
       ((CASE WHEN ln BETWEEN 50 AND 100000 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END
         + CASE WHEN punct_ratio <= 0.2 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END
         + CASE WHEN digit_ratio <= 0.3 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END
         + CASE WHEN s_en >= 0.01 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END
         + CASE WHEN mean_token_len BETWEEN 2.0 AND 12.0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)
        * 0.2::DOUBLE) AS quality,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
            WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
            WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
            WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
            ELSE 'fr' END AS lang_guess,
       md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint,
       n_winnow_fp, w.canon_url, w.url_dom, w.web_md5, w.n_blocks, w.n_kept,
       g.n_links, g.hub_rank, x.src_hub, x.lang_auth,
       CASE WHEN doc_id % 10 = 0 THEN CAST(2 AS BIGINT) END AS n_warc,
       CASE WHEN doc_id % 10 = 0 THEN CAST(1 AS BIGINT) END AS n_warc_md5,
       CASE WHEN doc_id % 10 = 0 THEN md5(m.text) END AS warc_md5,
       CASE WHEN doc_id % 10 = 0 THEN CAST(400 AS BIGINT) END
         AS warc_status_sum
FROM m JOIN web w USING (doc_id) JOIN lg g USING (doc_id)
       JOIN hx x USING (doc_id)
""".replace("{web_cte}", _web_cte_sql()) \
   .replace("{lg_cte}", _linkgraph_cte_sql()) \
   .replace("{hits_cte}", _hits_cte_sql()).replace("{sw_exprs}", ", ".join(
    f"CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, "
    f"t -> list_contains({_SW[lang]}, t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS s_{lang}"
    for lang in sorted(_SW)))

# -- portable LSH bucket SQL ------------------------------------------------
# The bucket formula must match llm/similarity.py bit-for-bit: per plane p,
# bit_p = (sum_j round(v[j] * sign(p,j) * 1e15)::BIGINT) >= 0, with the ±1
# signs from rademacher_signs (md5-derived — generated here by the SAME
# python function the Spark plan uses, inlined as SQL literals). Fixed-point
# accumulation makes the sum order-independent, so SUM in any engine agrees.


def _signs_bucket_sql(vec: str, dim: int = 64, num_planes: int = 8,
                      seed: int = 42, plane_offset: int = 0) -> str:
    from .llm.similarity import rademacher_signs
    bits = []
    for k in range(num_planes):
        p = plane_offset + k
        signs = "[" + ",".join("1.0" if s > 0 else "-1.0"
                               for s in rademacher_signs(dim, p, seed)) + "]"
        dot = (f"list_sum(list_transform(range(1, {dim + 1}), j -> "
               f"CAST(round({vec}[j] * ({signs})[j] * 1000000000000000.0) AS BIGINT)))")
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << k}::BIGINT ELSE 0::BIGINT END)")
    return "(" + " + ".join(bits) + ")"


_ND_BANDS = " ".join(
    f"WHEN {b} THEN {_signs_bucket_sql('v', num_planes=4, plane_offset=b * 4)}"
    for b in range(4))

ORACLES["embedding_near_dup"] = f"""
WITH RECURSIVE
cb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
-- MATERIALIZED: the 16 fixed-point plane dots per row are the oracle's
-- whole cost; without it DuckDB inlines this CTE into BOTH sides of the
-- bucket self-join and pays it twice (r8 profile: 2 x 6 s -> 1 x 6 s)
banded AS MATERIALIZED (
  SELECT vec_id, v, b, CASE b {_ND_BANDS} END AS bucket
  FROM cb, range(0, 4) bands(b)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id1, b2.vec_id AS id2
  FROM banded a JOIN banded b2
    ON a.b = b2.b AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
),
-- SemDeDup portable replica: explicit centroids = embeddings of vec_id
-- 0/1, nearest-centroid cell (squared euclidean, tie -> lower cell, the
-- IVF probe rule), within-cell cosine pairs, transitive-closure
-- components labeled by min reachable id, 'edge' survivor = lowest 6dp
-- centroid-cosine then min id per cluster
ctr AS (SELECT (SELECT v FROM cb WHERE vec_id = 0) AS c0,
               (SELECT v FROM cb WHERE vec_id = 1) AS c1),
asg AS (
  SELECT vec_id, v,
         CASE WHEN list_sum(list_transform(generate_series(1, 64),
                     i -> (v[i] - c0[i]) * (v[i] - c0[i])))
                   <= list_sum(list_transform(generate_series(1, 64),
                     i -> (v[i] - c1[i]) * (v[i] - c1[i])))
              THEN 0 ELSE 1 END AS cell
  FROM cb CROSS JOIN ctr
),
csim AS (
  SELECT a2.vec_id, a2.cell,
         round(list_cosine_similarity(
           a2.v, CASE WHEN a2.cell = 0 THEN ctr.c0 ELSE ctr.c1 END), 6)
           + 0.0 AS sim6
  FROM asg a2 CROSS JOIN ctr
),
sp AS (
  SELECT x.vec_id AS id1, y.vec_id AS id2
  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id
  WHERE list_cosine_similarity(x.v, y.v) >= 0.35
),
psym AS (SELECT id1 AS s, id2 AS t FROM sp
         UNION SELECT id2, id1 FROM sp),
reach AS (
  SELECT s, t FROM psym
  UNION
  SELECT r.s, p.t FROM reach r JOIN psym p ON r.t = p.s
),
clu AS (SELECT s AS doc, least(s, min(t)) AS cluster_id
        FROM reach GROUP BY s),
ranked AS (
  SELECT c.doc, c.cluster_id, m.sim6,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY m.sim6 ASC, c.doc ASC) AS rn
  FROM clu c JOIN csim m ON m.vec_id = c.doc
)
SELECT 'lsh' AS part, CAST(id1 AS BIGINT) AS a, CAST(id2 AS BIGINT) AS b,
       round(list_cosine_similarity(ca.v, cb2.v), 6) + 0.0 AS d
FROM cand JOIN cb ca ON ca.vec_id = id1 JOIN cb cb2 ON cb2.vec_id = id2
WHERE list_cosine_similarity(ca.v, cb2.v) >= 0.35
UNION ALL
SELECT 'semclu', CAST(doc AS BIGINT), CAST(cluster_id AS BIGINT), sim6
FROM ranked
UNION ALL
SELECT 'semkeep', CAST(vec_id AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM cb WHERE vec_id NOT IN (SELECT doc FROM clu)
UNION ALL
SELECT 'semkeep', CAST(doc AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM ranked WHERE rn = 1
UNION ALL
-- part='pool': embed_documents portable pooling — char-code fixture
-- vectors, per-position DECIMAL(30,8) mean, float32 back-cast
SELECT 'pool', CAST(doc_id AS BIGINT), CAST(pos AS BIGINT),
       CAST(CAST(m AS FLOAT) AS DOUBLE)
FROM (
  SELECT doc_id, i AS pos,
         CAST(SUM(CAST(comp AS DECIMAL(30,8))) AS DOUBLE) / count(*) AS m
  FROM (
    SELECT doc_id, i,
           CAST((ascii(substr(word, CAST(i % length(word) AS INT) + 1, 1))
                 * (i + 3)) % 100 AS DOUBLE) / 100.0 - 0.5 AS comp
    FROM (SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '{_BPE}')) AS word
          FROM documents),
         (SELECT unnest(range(8)) AS i)
  )
  GROUP BY doc_id, i
)
"""

ORACLES["dedup_minhash_lsh"] = f"""
WITH t AS (SELECT doc_id, {_tokens('text')} AS toks FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(list_slice(toks, i, i + 2), ' '))
           ELSE [] END) AS shs
  FROM t
),
sig AS (
  SELECT doc_id,
         list_transform(range(0, 16), i -> list_min(list_transform(shs,
           s -> CAST(('0x' || substr(md5(s || '#' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT)))) AS sg
  FROM sh WHERE len(shs) > 0
),
banded AS (
  SELECT doc_id, b,
         CAST(('0x' || substr(md5(
           array_to_string(list_transform(range(b * 4 + 1, b * 4 + 5),
                                          r -> CAST(sg[r] AS VARCHAR)), '_')
           || '#' || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT) AS bucket
  FROM sig, range(0, 4) bands(b)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2
  FROM banded a JOIN banded b2
    ON a.b = b2.b AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
)
SELECT 'full' AS part, CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2
FROM pairs
UNION ALL
SELECT 'incremental', CAST(id1 AS BIGINT), CAST(id2 AS BIGINT)
FROM pairs
UNION ALL
SELECT 'stream', CAST(id1 AS BIGINT), CAST(id2 AS BIGINT)
FROM pairs
"""

ORACLES["dedup_simhash"] = f"""
WITH t AS (SELECT doc_id, {_tokens('text')} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS lo,
         CAST(('0x' || substr(md5(tk), 16, 1)) AS BIGINT) AS hi
  FROM tok
),
bits AS (
  SELECT doc_id, ps.p,
         SUM(CASE WHEN (CASE WHEN ps.p < 60 THEN (lo >> ps.p) & 1
                        ELSE (hi >> (ps.p - 60)) & 1 END) = 1
                  THEN 1 ELSE -1 END) AS cnt
  FROM h, range(0, 64) ps(p)
  GROUP BY doc_id, ps.p
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN cnt > 0 THEN
             CASE WHEN p = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                  ELSE (1::BIGINT << p) END
           ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
),
full_sig AS (
  SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
  FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id
),
sbanded AS (
  -- 4 x 16-bit pigeonhole bands; arithmetic >> then & 65535 keeps the low
  -- 16 bits of the shifted value, matching Spark's shiftrightunsigned+mask
  SELECT doc_id, simhash, bs.b, (simhash >> (bs.b * 16)) & 65535 AS bits
  FROM full_sig, range(0, 4) bs(b)
),
ipairs AS (
  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2,
         bit_count(xor(x.simhash, y.simhash)) AS hamming
  FROM sbanded x JOIN sbanded y
    ON x.b = y.b AND x.bits = y.bits AND x.doc_id < y.doc_id
  WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
)
SELECT 'group' AS part, simhash AS a, CAST(min(doc_id) AS BIGINT) AS b,
       count(*) AS c
FROM full_sig GROUP BY simhash
UNION ALL
SELECT 'incremental', CAST(id1 AS BIGINT), CAST(id2 AS BIGINT),
       CAST(hamming AS BIGINT)
FROM ipairs
"""

ORACLES["similarity_ann_lsh"] = f"""
WITH cb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {_signs_bucket_sql('(embedding::DOUBLE[])')} AS bucket
  FROM embeddings
),
qb AS (SELECT vec_id AS query_id, v AS qv, bucket FROM cb WHERE vec_id < 20),
scored AS (
  SELECT qb.query_id, cb.vec_id AS neighbor_id,
         list_cosine_similarity(qb.qv, cb.v) AS cosine,
         row_number() OVER (PARTITION BY qb.query_id
                            ORDER BY list_cosine_similarity(qb.qv, cb.v) DESC,
                                     cb.vec_id ASC) AS rank
  FROM cb JOIN qb ON cb.bucket = qb.bucket
  WHERE cb.vec_id != qb.query_id
),
-- multi-probe (n_flip=1): the query side probes its own bucket AND the
-- hamming-1 bucket with plane bit 0 flipped; same equi-join, corpus
-- side untouched. A corpus vector has exactly one bucket and the two
-- probed ids differ, so (query, neighbor) never repeats.
qp AS (
  SELECT query_id, qv, bucket FROM qb
  UNION ALL
  SELECT query_id, qv, xor(bucket, 1) FROM qb
),
probe_scored AS (
  SELECT qp.query_id, cb.vec_id AS neighbor_id,
         list_cosine_similarity(qp.qv, cb.v) AS cosine,
         row_number() OVER (PARTITION BY qp.query_id
                            ORDER BY list_cosine_similarity(qp.qv, cb.v) DESC,
                                     cb.vec_id ASC) AS rank
  FROM cb JOIN qp ON cb.bucket = qp.bucket
  WHERE cb.vec_id != qp.query_id
)
SELECT 'base' AS part, query_id, neighbor_id, CAST(rank AS INT) AS rank,
       round(cosine, 6) + 0.0 AS cosine6
FROM scored WHERE rank <= 5
UNION ALL
SELECT 'probe1', query_id, neighbor_id, CAST(rank AS INT),
       round(cosine, 6) + 0.0
FROM probe_scored WHERE rank <= 5
"""

ORACLES["corpus_mixture"] = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z]+'),
                     t -> t <> '') AS w
  FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 8
              THEN list_distinct(list_transform(
                     generate_series(1, len(w) - 7),
                     i -> array_to_string(w[i:i+7], ' ')))
              ELSE []::VARCHAR[] END AS g
  FROM w
), eval_grams AS (
  SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 10 = 0
), contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, unnest(g) AS gram FROM grams) t
  JOIN eval_grams e USING (gram)
)
, sampled AS (
  SELECT * FROM documents d
  WHERE CASE lang
        WHEN 'en' THEN ((d.doc_id % 1000000 + 42) * 2654435761) % 1000000 < 1000000
        WHEN 'fr' THEN ((d.doc_id % 1000000 + 42) * 2654435761) % 1000000 < 500000
        WHEN 'de' THEN ((d.doc_id % 1000000 + 42) * 2654435761) % 1000000 < 250000
        WHEN 'es' THEN ((d.doc_id % 1000000 + 42) * 2654435761) % 1000000 < 100000
        ELSE FALSE END
), kmv_u AS (
  -- portable unit hash (sketches._unit_hash_portable): md5-prefix int60 /
  -- 2^60, distinct per (lang, u) exactly like kmv_partial
  SELECT DISTINCT lang,
         CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
           / 1152921504606846976.0 AS u
  FROM sampled
), kmv_rn AS (
  SELECT lang, u, row_number() OVER (PARTITION BY lang ORDER BY u) AS rn,
         count(*) OVER (PARTITION BY lang) AS nd
  FROM kmv_u
), kmv_est AS (
  SELECT lang,
         CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
              ELSE 63.0 / max(CASE WHEN rn = 64 THEN u END) END
           AS kmv_distinct_est
  FROM kmv_rn GROUP BY lang
)
, strat AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
           ORDER BY ((doc_id % 1000000 + 42) * 2654435761) % 1000000,
                    doc_id) AS rn
  FROM documents
), bgt AS (
  SELECT lang, doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang
           ORDER BY ((doc_id % 1000000 + 42) * 2654435761) % 1000000, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CASE lang WHEN 'en' THEN 30000 WHEN 'fr' THEN 10000
              WHEN 'de' THEN 10000 WHEN 'es' THEN 10000 ELSE 0 END AS lim
  FROM documents
), pack AS (
  SELECT lang, doc_id, n_chars,
         CAST(SUM(n_chars) OVER (PARTITION BY lang
           ORDER BY ((doc_id % 1000000 + 42) * 2654435761) % 1000000, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_chars AS BIGINT) AS off
  FROM documents
), chk AS (
  SELECT doc_id, toks, n, unnest(range(0, n, 24)) AS s
  FROM (SELECT doc_id, toks, len(toks) AS n
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text),
                                                       '[^\\p{L}\\p{N}]+'),
                                 t -> length(t) >= 1) AS toks
              FROM documents))
  WHERE n > 0
)
SELECT 'mix' AS part, s.lang, count(*) AS a,
       CAST(SUM(n_chars) AS BIGINT) AS b,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS c,
       max(k.kmv_distinct_est) AS d
FROM sampled s
LEFT JOIN contaminated c USING (doc_id)
JOIN kmv_est k ON k.lang = s.lang
GROUP BY s.lang
UNION ALL
SELECT 'strat', lang, CAST(doc_id AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM strat WHERE rn <= 20
UNION ALL
SELECT 'budget', lang, CAST(doc_id AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM bgt WHERE cum - n_chars < lim
UNION ALL
SELECT 'pack', lang, CAST(doc_id AS BIGINT), off,
       CAST(greatest(off + n_chars - 1, off) // 2048 AS BIGINT),
       CAST(off // 2048 AS DOUBLE)
FROM pack
UNION ALL
SELECT 'chunk', md5(array_to_string(toks[s+1:s+32], ' ')),
       CAST(doc_id AS BIGINT), CAST(s // 24 AS BIGINT),
       CAST(least(s + 32, n) - s AS BIGINT), CAST(NULL AS DOUBLE)
FROM chk WHERE s = 0 OR s - 24 + 32 < n
"""

ORACLES["retrieval_indexed"] = """
SELECT 'bm25' AS part, CAST(qid AS VARCHAR) AS lang,
       CAST(doc_id AS BIGINT) AS a,
       CAST(rank AS BIGINT) AS b, CAST(NULL AS BIGINT) AS c,
       CAST(score AS DOUBLE) AS d
FROM (
  WITH btoks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'),
                       t -> length(t) >= 1) AS toks
    FROM documents
  ),
  bex AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM btoks),
  bpost AS (SELECT term, doc_id, dl, count(*) AS tf
            FROM bex GROUP BY term, doc_id, dl),
  bstat AS (SELECT count(*) AS n, sum(len(toks)) AS tot FROM btoks),
  bdf AS (SELECT term, count(*) AS df FROM bpost GROUP BY term),
  bqt AS (
    SELECT DISTINCT qid, term FROM (
      SELECT doc_id AS qid,
             unnest(list_filter(
               regexp_split_to_array(lower(substr(text, 1, 120)),
                                     '[^\\p{L}\\p{N}]+'),
               t -> length(t) >= 1)) AS term
      FROM documents WHERE doc_id < 3)
  ),
  bscored AS (
    SELECT qt.qid, p.doc_id,
           SUM(CAST(round(
             ln(1.0 + ((CAST(s.n AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                       / (CAST(d.df AS DOUBLE) + 0.5)))
             * ((CAST(p.tf AS DOUBLE) * 2.2)
                / (CAST(p.tf AS DOUBLE)
                   + 1.2 * (0.25 + (0.75 * CAST(p.dl AS DOUBLE))
                            / (CAST(s.tot AS DOUBLE) / CAST(s.n AS DOUBLE)))))
           , 6) AS DECIMAL(18,6))) AS score
    FROM bpost p
    JOIN bqt qt USING (term)
    JOIN bdf d USING (term)
    CROSS JOIN bstat s
    GROUP BY qt.qid, p.doc_id
  )
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM bscored
) WHERE rank <= 5
"""

# part='bm25s' (r9): the streaming-ingest twin of the bm25 arm —
# per-batch postings/stats assembly is identical whether a batch arrived
# by append_bm25_index or through the foreachBatch stream writer, so the
# oracle replica simply repeats under the new label
ORACLES["retrieval_indexed"] += "\nUNION ALL\n" + \
    ORACLES["retrieval_indexed"].replace(
        "SELECT 'bm25' AS part,", "SELECT 'bm25s' AS part,", 1)

# repeat: domain_reweight epochs expansion. The coefficient literals are
# config-derived (scale * normalized share) and printed at full round-trip
# precision; N and n_d come from SQL counts, and the IEEE op order
# (coef * N) / n matches llm/curation.domain_reweight exactly, so the
# resulting doubles are bit-identical cross-engine.
_RW_SUMW = float(sum(RW_SHARES.values()))
_RW_COEF_CASE = " ".join(
    f"WHEN '{g}' THEN {RW_SCALE * (float(w) / _RW_SUMW)!r}"
    for g, w in sorted(RW_SHARES.items()))
_RW_LANGS = ", ".join(f"'{g}'" for g in sorted(RW_SHARES))
ORACLES["corpus_mixture"] += f"""
UNION ALL
SELECT 'repeat', lang, CAST(doc_id AS BIGINT),
       CAST(unnest(generate_series(1, n_ep)) AS BIGINT),
       CAST(n_ep AS BIGINT), r
FROM (
  WITH rwc AS (SELECT lang, count(*) AS n FROM documents
               WHERE lang IN ({_RW_LANGS}) GROUP BY lang),
       rwt AS (SELECT sum(n) AS ntot FROM rwc),
       rwr AS (
         SELECT d.doc_id, d.lang,
                LEAST(GREATEST(
                  ((CASE d.lang {_RW_COEF_CASE} END) * ntot) / n,
                  0.0), 100.0) AS r
         FROM documents d JOIN rwc USING (lang) CROSS JOIN rwt)
  SELECT doc_id, lang, r,
         CAST(floor(r) AS BIGINT) +
         CASE WHEN ((doc_id % 1000000 + 42) * 2654435761) % 1000000
                   < CAST(floor((r - floor(r)) * 1000000.0) AS BIGINT)
              THEN 1 ELSE 0 END AS n_ep
  FROM rwr
)
UNION ALL
-- divers: diversity_sample via explicit centroids (embeddings 0/1/2):
-- nearest-centroid cell (squared euclidean, ties -> lower cell), per-cell
-- quota draw in (hash_bucket, id) order, quota 30
SELECT 'divers', CAST(NULL AS VARCHAR), CAST(vec_id AS BIGINT),
       CAST(cell AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM (
  WITH dcb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  dctr AS (SELECT (SELECT v FROM dcb WHERE vec_id = 0) AS c0,
                  (SELECT v FROM dcb WHERE vec_id = 1) AS c1,
                  (SELECT v FROM dcb WHERE vec_id = 2) AS c2),
  dasg AS (
    SELECT vec_id,
           CASE WHEN d0 <= d1 AND d0 <= d2 THEN 0
                WHEN d1 <= d2 THEN 1 ELSE 2 END AS cell
    FROM (
      SELECT vec_id,
             list_sum(list_transform(generate_series(1, 64),
               i -> (v[i] - c0[i]) * (v[i] - c0[i]))) AS d0,
             list_sum(list_transform(generate_series(1, 64),
               i -> (v[i] - c1[i]) * (v[i] - c1[i]))) AS d1,
             list_sum(list_transform(generate_series(1, 64),
               i -> (v[i] - c2[i]) * (v[i] - c2[i]))) AS d2
      FROM dcb CROSS JOIN dctr)
  ),
  dsel AS (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY cell
             ORDER BY ((vec_id % 1000000 + 42) * 2654435761) % 1000000,
                      vec_id) AS rn
    FROM dasg)
  SELECT vec_id, cell FROM dsel WHERE rn <= 30
)
"""

# rrf: Reciprocal Rank Fusion of the bm25 top-5 (replicated identically
# to the part='bm25' arm) with embedding-cosine brute top-5; the Spark
# side adds 0.0 + coalesce(1/(60+rank_bm25), 0) + coalesce(1/(60+rank_ann), 0)
# in THAT syntactic order (outer-join chain), replicated op-for-op, then
# re-ranks (score desc, doc_id), top 8.
ORACLES["retrieval_indexed"] += """
UNION ALL
SELECT 'rrf', CAST(query_id AS VARCHAR), CAST(doc_id AS BIGINT),
       CAST(rank AS BIGINT), CAST(NULL AS BIGINT), score
FROM (
  WITH rtoks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'),
                       t -> length(t) >= 1) AS toks
    FROM documents
  ),
  rex AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM rtoks),
  rpost AS (SELECT term, doc_id, dl, count(*) AS tf
            FROM rex GROUP BY term, doc_id, dl),
  rstat AS (SELECT count(*) AS n, sum(len(toks)) AS tot FROM rtoks),
  rdf AS (SELECT term, count(*) AS df FROM rpost GROUP BY term),
  rqt AS (
    SELECT DISTINCT qid, term FROM (
      SELECT doc_id AS qid,
             unnest(list_filter(
               regexp_split_to_array(lower(substr(text, 1, 120)),
                                     '[^\\p{L}\\p{N}]+'),
               t -> length(t) >= 1)) AS term
      FROM documents WHERE doc_id < 3)
  ),
  rscored AS (
    SELECT qt.qid, p.doc_id,
           SUM(CAST(round(
             ln(1.0 + ((CAST(s.n AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                       / (CAST(d.df AS DOUBLE) + 0.5)))
             * ((CAST(p.tf AS DOUBLE) * 2.2)
                / (CAST(p.tf AS DOUBLE)
                   + 1.2 * (0.25 + (0.75 * CAST(p.dl AS DOUBLE))
                            / (CAST(s.tot AS DOUBLE) / CAST(s.n AS DOUBLE)))))
           , 6) AS DECIMAL(18,6))) AS score
    FROM rpost p
    JOIN rqt qt USING (term)
    JOIN rdf d USING (term)
    CROSS JOIN rstat s
    GROUP BY qt.qid, p.doc_id
  ),
  rbm AS (
    SELECT qid AS query_id, doc_id, rank FROM (
      SELECT qid, doc_id,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, doc_id ASC) AS rank
      FROM rscored
    ) WHERE rank <= 5
  ),
  rann AS (
    SELECT query_id, doc_id, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                        c.vec_id ASC) AS rank
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE vec_id < 3) q
      JOIN (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) c
        ON c.vec_id != q.vec_id
    ) WHERE rank <= 5
  ),
  rfused AS (
    SELECT query_id, doc_id,
           (CAST(0.0 AS DOUBLE)
            + COALESCE(CAST(1.0 AS DOUBLE)
                       / (CAST(60.0 AS DOUBLE) + CAST(b.rank AS DOUBLE)),
                       CAST(0.0 AS DOUBLE))
            + COALESCE(CAST(1.0 AS DOUBLE)
                       / (CAST(60.0 AS DOUBLE) + CAST(a.rank AS DOUBLE)),
                       CAST(0.0 AS DOUBLE))) AS score
    FROM rbm b FULL OUTER JOIN rann a USING (query_id, doc_id)
  )
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM rfused
) WHERE rank <= 8
"""

# pareto: the GPT-3 quality re-sampling keep rule, exact replica —
# keep iff u^(-1/9) - 1 > 1 - s, u = (hash_bucket(id,42)+1)/1e6,
# s = (doc_id % 100)/100. The exponent literal is repr(-1.0/9.0) so both
# engines raise to the identical double.
ORACLES["retrieval_indexed"] += f"""
UNION ALL
SELECT 'pareto', lang, CAST(doc_id AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       (CAST(doc_id % 100 AS DOUBLE) / CAST(100.0 AS DOUBLE))
         + CAST(0.0 AS DOUBLE)
FROM (SELECT doc_id, lang,
             ((doc_id % 1000000 + 42) * 2654435761) % 1000000 AS hb
      FROM documents)
WHERE power((CAST(hb AS DOUBLE) + CAST(1.0 AS DOUBLE))
              / CAST(1000000.0 AS DOUBLE),
            CAST({-1.0 / 9.0!r} AS DOUBLE)) - CAST(1.0 AS DOUBLE)
      > CAST(1.0 AS DOUBLE)
        - (CAST(doc_id % 100 AS DOUBLE) / CAST(100.0 AS DOUBLE))
"""

# shard: deterministic shard assignment + intra-shard order (the Spark
# side reads these back from the written parquet shard layout)
ORACLES["retrieval_indexed"] += """
UNION ALL
SELECT 'shard', lang, CAST(doc_id AS BIGINT),
       CAST(hb % 8 AS BIGINT),
       CAST(row_number() OVER (PARTITION BY hb % 8
                               ORDER BY hb, doc_id) AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM (SELECT doc_id, lang,
             ((doc_id % 1000000 + 42) * 2654435761) % 1000000 AS hb
      FROM documents)
"""

# dsir + dsirtop: llm/dsir.py replica (Xie et al., NeurIPS 2023), portable
# mode. Rebuilds the hashed unigram+bigram buckets (portable md5-prefix
# hash % 512, WITH multiplicity), both corpus bucket distributions
# (raw = all documents, target = lang='en'), Laplace smoothing with
# explicit DOUBLE casts (DuckDB numeric literals are DECIMAL), ln rounded
# 6dp AT THE TABLE, per-doc DECIMAL(18,6)-exact fold — and, for dsirtop,
# the deterministic Gumbel top-k: u = (hash_bucket(id,42)+0.5)/1e6,
# key = round(lw - ln(-ln(u)), 6), ORDER BY key DESC, id — k=40.
ORACLES["retrieval_indexed"] += """
UNION ALL
SELECT part, lang, a, b, c, d FROM (
  WITH dtok AS (
    SELECT doc_id, lang,
           list_filter(regexp_split_to_array(lower(text), '[^0-9a-z]+'),
                       t -> t <> '') AS w
    FROM documents
  ), dfeat AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 512 AS bucket
    FROM (
      SELECT doc_id, unnest(list_concat(
               w,
               CASE WHEN len(w) >= 2
                    THEN list_transform(generate_series(1, len(w) - 1),
                                        i -> w[i] || ' ' || w[i + 1])
                    ELSE []::VARCHAR[] END)) AS g
      FROM dtok)
  ), dlang AS (SELECT doc_id, lang FROM documents
  ), ragg AS (SELECT bucket, count(*) AS rc FROM dfeat GROUP BY bucket
  ), rtot AS (SELECT count(*) AS rt FROM dfeat
  ), tagg AS (SELECT bucket, count(*) AS tc FROM dfeat
              JOIN dlang USING (doc_id) WHERE lang = 'en' GROUP BY bucket
  ), ttot AS (SELECT count(*) AS tt FROM dfeat
              JOIN dlang USING (doc_id) WHERE lang = 'en'
  ), ltab AS (
    SELECT b.bucket,
           round(ln(
             ((CAST(COALESCE(tc, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
              / (CAST(tt AS DOUBLE) + CAST(512.0 AS DOUBLE)))
             / ((CAST(COALESCE(rc, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE))
                / (CAST(rt AS DOUBLE) + CAST(512.0 AS DOUBLE)))
           ), 6) AS lr
    FROM (SELECT unnest(generate_series(0, 511)) AS bucket) b
    LEFT JOIN ragg USING (bucket) LEFT JOIN tagg USING (bucket)
    CROSS JOIN rtot CROSS JOIN ttot
  ), dw AS (
    SELECT d.doc_id, d.lang,
           CAST(COALESCE(f.n_feats, 0) AS BIGINT) AS n_feats,
           COALESCE(f.lw, CAST(0.0 AS DOUBLE)) AS lw
    FROM documents d LEFT JOIN (
      SELECT doc_id, count(*) AS n_feats,
             CAST(SUM(CAST(lr AS DECIMAL(18,6))) AS DOUBLE) AS lw
      FROM dfeat JOIN ltab USING (bucket)
      GROUP BY doc_id
    ) f USING (doc_id)
  ), gk AS (
    SELECT doc_id, lang, lw,
           round(lw - ln(-ln(
             (CAST(((doc_id % 1000000 + 42) * 2654435761) % 1000000
                   AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / CAST(1000000.0 AS DOUBLE))), 6) AS k6
    FROM dw
  )
  SELECT 'dsir' AS part, lang, CAST(doc_id AS BIGINT) AS a,
         n_feats AS b, CAST(NULL AS BIGINT) AS c, lw AS d
  FROM dw
  UNION ALL
  SELECT 'dsirs', lang, CAST(doc_id AS BIGINT),
         n_feats, CAST(NULL AS BIGINT), lw
  FROM dw
  UNION ALL
  SELECT 'dsirtop', lang, CAST(doc_id AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), lw
  FROM (SELECT doc_id, lang, lw,
               row_number() OVER (ORDER BY k6 DESC, doc_id) AS rn
        FROM gk)
  WHERE rn <= 40
)
"""

ORACLES["similarity_topk"] = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 20),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, c.embedding::DOUBLE[]) AS cosine,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qv, c.embedding::DOUBLE[]) DESC,
                                     c.vec_id ASC) AS rank
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id != q.query_id
),
-- SQ8 grid replica (llm/similarity.py sq_train/sq_encode/sq_reconstruct):
-- per-dimension [lo, hi] over the corpus, uniform 256-level grid,
-- code = clamp(round((x - lo)/step)), recon = code*step + lo. Each step is
-- one IEEE double op in the same order as the Spark plan, so recon vectors
-- are bit-identical across engines.
grid AS (
  SELECT i.i AS i, min(c.embedding[i.i]::DOUBLE) AS lo,
         CASE WHEN max(c.embedding[i.i]::DOUBLE) > min(c.embedding[i.i]::DOUBLE)
              THEN (max(c.embedding[i.i]::DOUBLE) - min(c.embedding[i.i]::DOUBLE)) / 255
              ELSE 1.0 END AS step
  FROM embeddings c CROSS JOIN range(1, 65) i(i)
  GROUP BY i.i
),
recon AS (
  SELECT c.vec_id,
         list(LEAST(255.0, GREATEST(0.0,
                round((c.embedding[g.i]::DOUBLE - g.lo) / g.step)))
              * g.step + g.lo ORDER BY g.i) AS rv
  FROM embeddings c CROSS JOIN grid g
  GROUP BY c.vec_id
),
sq_scored AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, r.rv) AS cosine,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qv, r.rv) DESC,
                                     r.vec_id ASC) AS rank
  FROM recon r CROSS JOIN q
  WHERE r.vec_id != q.query_id
),
-- IVF-PQ replica (llm/similarity.py pq_encode/ivf_pq_topk, explicit
-- model): centroids = embeddings 0/1, codebook word c of subspace j =
-- embedding (2+c)'s dims j*8+1..j*8+8. Per vector: nearest cell
-- (squared euclidean, tie -> cell 0), residual v - centroid, per-
-- subspace argmin code (tie -> lowest), reconstruction = centroid +
-- selected codewords. n_probe=1: each query scores ONLY its own
-- nearest cell's vectors.
pcb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pctr AS (SELECT (SELECT v FROM pcb WHERE vec_id = 0) AS c0,
                (SELECT v FROM pcb WHERE vec_id = 1) AS c1),
pword AS (SELECT vec_id - 2 AS c, v FROM pcb
          WHERE vec_id >= 2 AND vec_id < 18),
pasg AS (
  SELECT vec_id, v,
         CASE WHEN list_sum(list_transform(generate_series(1, 64),
                     i -> (v[i] - c0[i]) * (v[i] - c0[i])))
                   <= list_sum(list_transform(generate_series(1, 64),
                     i -> (v[i] - c1[i]) * (v[i] - c1[i])))
              THEN 0 ELSE 1 END AS cell
  FROM pcb CROSS JOIN pctr
),
pres AS (
  SELECT a.vec_id, a.cell,
         list_transform(generate_series(1, 64),
           i -> a.v[i] - (CASE WHEN a.cell = 0 THEN ctr.c0
                               ELSE ctr.c1 END)[i]) AS res
  FROM pasg a CROSS JOIN pctr ctr
),
pqd AS (
  SELECT r.vec_id, j.j, w.c,
         list_sum(list_transform(generate_series(1, 8),
           t -> (r.res[j.j * 8 + t] - w.v[j.j * 8 + t])
                * (r.res[j.j * 8 + t] - w.v[j.j * 8 + t]))) AS d
  FROM pres r CROSS JOIN range(0, 8) j(j) CROSS JOIN pword w
),
pqsel AS (
  SELECT vec_id, j, c,
         row_number() OVER (PARTITION BY vec_id, j
                            ORDER BY d ASC, c ASC) AS rn
  FROM pqd
),
pqrec AS (
  SELECT s.vec_id,
         flatten(list(list_transform(generate_series(1, 8),
           t -> (CASE WHEN a.cell = 0 THEN ctr.c0 ELSE ctr.c1 END)
                  [s.j * 8 + t] + w.v[s.j * 8 + t])
           ORDER BY s.j)) AS rv
  FROM pqsel s JOIN pasg a USING (vec_id)
       JOIN pword w ON w.c = s.c CROSS JOIN pctr ctr
  WHERE s.rn = 1
  GROUP BY s.vec_id
),
pqq AS (
  SELECT q.query_id, q.qv,
         CASE WHEN list_sum(list_transform(generate_series(1, 64),
                     i -> (q.qv[i] - c0[i]) * (q.qv[i] - c0[i])))
                   <= list_sum(list_transform(generate_series(1, 64),
                     i -> (q.qv[i] - c1[i]) * (q.qv[i] - c1[i])))
              THEN 0 ELSE 1 END AS qcell
  FROM q CROSS JOIN pctr
),
pq_scored AS (
  -- rank on the 6dp-ROUNDED cosine (ivf_pq_topk quantize=6): the ADC
  -- decomposition and this direct-reconstruction cosine differ in IEEE
  -- association order, so only the rounded value is cross-form stable
  SELECT qq.query_id, r.vec_id AS neighbor_id,
         round(list_cosine_similarity(qq.qv, r.rv), 6) AS cosine,
         row_number() OVER (PARTITION BY qq.query_id
                            ORDER BY round(list_cosine_similarity(qq.qv, r.rv), 6) DESC,
                                     r.vec_id ASC) AS rank
  FROM pqrec r JOIN pasg a USING (vec_id)
       JOIN pqq qq ON qq.qcell = a.cell
  WHERE r.vec_id != qq.query_id
),
-- OPQ replica (llm/similarity.py opq_topk, explicit model): rotation R
-- inlined as the SAME float literals the Spark model carries
-- (_opq_gate_rotation — decimal text round-trips to identical doubles
-- in both engines); rotated vector output j = sum_i v[i]*R[i][j]
-- (rotate_vector's column dot); flat-PQ argmin codes over the
-- embeddings-2..17 codebooks (tie -> lowest code); reconstruction =
-- selected codewords only (no centroid); corpus = even vec_ids
-- (mirrors the gate's subsample); rank on the 6dp-rounded
-- rotated-space cosine (quantize=6 — ADC association caveat as pq_adc)
orot AS (SELECT $OPQ_ROT$ AS rm),
orv AS (
  SELECT p.vec_id,
         list_transform(generate_series(1, 64),
           j -> list_sum(list_transform(generate_series(1, 64),
             i -> p.v[i] * rm[i][j]))) AS rv
  FROM pcb p CROSS JOIN orot
  WHERE p.vec_id % 2 = 0
),
oqd AS (
  SELECT r.vec_id, j.j, w.c,
         list_sum(list_transform(generate_series(1, 8),
           t -> (r.rv[j.j * 8 + t] - w.v[j.j * 8 + t])
                * (r.rv[j.j * 8 + t] - w.v[j.j * 8 + t]))) AS d
  FROM orv r CROSS JOIN range(0, 8) j(j) CROSS JOIN pword w
),
osel AS (
  SELECT vec_id, j, c,
         row_number() OVER (PARTITION BY vec_id, j
                            ORDER BY d ASC, c ASC) AS rn
  FROM oqd
),
orec AS (
  SELECT s.vec_id,
         flatten(list(list_transform(generate_series(1, 8),
           t -> w.v[s.j * 8 + t]) ORDER BY s.j)) AS rv
  FROM osel s JOIN pword w ON w.c = s.c
  WHERE s.rn = 1
  GROUP BY s.vec_id
),
oq AS (
  SELECT q.query_id,
         list_transform(generate_series(1, 64),
           j -> list_sum(list_transform(generate_series(1, 64),
             i -> q.qv[i] * rm[i][j]))) AS qrv
  FROM q CROSS JOIN orot
),
opq_scored AS (
  SELECT oq.query_id, r.vec_id AS neighbor_id,
         round(list_cosine_similarity(oq.qrv, r.rv), 6) AS cosine,
         row_number() OVER (PARTITION BY oq.query_id
                            ORDER BY round(list_cosine_similarity(oq.qrv, r.rv), 6) DESC,
                                     r.vec_id ASC) AS rank
  FROM orec r CROSS JOIN oq
  WHERE r.vec_id != oq.query_id
)
SELECT m.method, s.query_id, s.neighbor_id, CAST(s.rank AS INT) AS rank,
       round(s.cosine, 6) + 0.0 AS cosine6
FROM scored s CROSS JOIN (VALUES ('brute'), ('ivf_full_probe')) m(method)
WHERE s.rank <= 5
UNION ALL
SELECT 'sq_reconstructed', query_id, neighbor_id, CAST(rank AS INT),
       round(cosine, 6) + 0.0
FROM sq_scored WHERE rank <= 5
UNION ALL
SELECT 'pq_adc', query_id, neighbor_id, CAST(rank AS INT),
       round(cosine, 6) + 0.0
FROM pq_scored WHERE rank <= 5
UNION ALL
SELECT 'opq', query_id, neighbor_id, CAST(rank AS INT),
       round(cosine, 6) + 0.0
FROM opq_scored WHERE rank <= 5
"""

# inline the OPQ gate rotation as a DuckDB list-of-lists literal: python
# repr is the shortest round-trip decimal, and DuckDB parses decimal text
# to the nearest double, so both engines see bit-identical R entries
ORACLES["similarity_topk"] = ORACLES["similarity_topk"].replace(
    "$OPQ_ROT$",
    "[" + ",".join(
        "[" + ",".join(repr(x) for x in row) + "]"
        for row in _opq_gate_rotation(64)) + "]")

ORACLES["sessionize"] = """
WITH s AS (
  SELECT user_id, ts, value, epoch_ms(ts) AS tms,
         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                   OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT)
             AS session_id
  FROM s
), g AS (
  SELECT user_id, session_id, count(*) AS n_events,
         min(tms) AS start_ms, max(tms) AS end_ms,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
  FROM numbered
  GROUP BY user_id, session_id
), wm AS (SELECT max(epoch_ms(ts)) - 3600000 AS w FROM events)
SELECT 'batch' AS part, CAST(user_id AS VARCHAR) AS key, session_id,
       n_events, start_ms, end_ms, total_value
FROM g
UNION ALL
-- streaming session_window, APPEND-mode expiry rule: the session window
-- spans [first event, last event + gap]; it emits exactly when the final
-- watermark (max input event time - delay) strictly passes its end
SELECT 'stream', CAST(user_id AS VARCHAR), CAST(NULL AS BIGINT),
       n_events, start_ms, end_ms + 1800000, total_value
FROM g WHERE end_ms + 1800000 < (SELECT w FROM wm)
"""

ORACLES["streaming_window"] = """
SELECT epoch_ms(date_trunc('day', ts)) AS window_start_ms,
       event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY date_trunc('day', ts), event_type
"""

# full slot-level replica of q_sanity_checker: rebuild the transmogrify
# layout (5 one-hot values by (count desc, value asc) with min_support, an
# OTHER slot, a null slot, acctbal mean-filled value + null slot), compute
# the same var_pop / moment-based Pearson stats per slot, apply the same
# keep rule (vx > 1e-5 AND NOT |corr| >= 0.9). The mean-fill COALESCE only
# fires when nulls exist (exact_mean is decimal-exact in Spark; TPC-H
# acctbal is non-null, so the fill never engages at the gate's SF).
ORACLES["sanity_checker"] = """
WITH y AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         CASE WHEN c_acctbal > 5000 THEN 1.0 ELSE 0.0 END AS y
  FROM customer
),
seg AS (
  SELECT c_mktsegment AS v FROM y WHERE c_mktsegment IS NOT NULL
  GROUP BY 1 HAVING count(*) >= 5
  ORDER BY count(*) DESC, v ASC LIMIT 5
),
slotvals AS (
  SELECT y.y, 'hot_' || s.v AS slot,
         CASE WHEN y.c_mktsegment = s.v THEN 1.0 ELSE 0.0 END AS x
  FROM y CROSS JOIN seg s
  UNION ALL
  SELECT y.y, 'other', CASE WHEN c_mktsegment IS NOT NULL
         AND c_mktsegment NOT IN (SELECT v FROM seg) THEN 1.0 ELSE 0.0 END
  FROM y
  UNION ALL
  SELECT y.y, 'null_mkt', CASE WHEN c_mktsegment IS NULL THEN 1.0 ELSE 0.0 END
  FROM y
  UNION ALL
  SELECT y.y, 'acctbal',
         COALESCE(c_acctbal, (SELECT avg(c_acctbal) FROM y))
  FROM y
  UNION ALL
  SELECT y.y, 'null_acctbal', CASE WHEN c_acctbal IS NULL THEN 1.0 ELSE 0.0 END
  FROM y
),
stats AS (
  SELECT slot, var_pop(x) AS vx, var_pop(y) AS vy,
         avg(x) AS mx, avg(y) AS my, avg(x * y) AS mxy
  FROM slotvals GROUP BY slot
),
kept AS (
  SELECT count(*) AS k FROM stats
  WHERE vx IS NOT NULL AND vx > 1e-5
    AND NOT (vx > 0 AND vy > 0
             AND abs((mxy - mx * my) / (sqrt(vx) * sqrt(vy))) >= 0.9)
)
SELECT c_custkey, (SELECT CAST(k AS INTEGER) FROM kept) AS n_slots_kept
FROM customer
"""

# slot-exact replica of q_transmogrify_vector's exploded layout: one-hot
# slots indexed by (count desc, value asc), then OTHER, null, acctbal
# mean-filled value, acctbal null (transmogrify concatenation order)
ORACLES["transmogrify_vector"] = """
WITH seg0 AS (
  SELECT c_mktsegment AS v, count(*) AS n FROM customer
  WHERE c_mktsegment IS NOT NULL
  GROUP BY 1 HAVING count(*) >= 5
  ORDER BY n DESC, v ASC LIMIT 5
),
seg AS (
  SELECT v, CAST(row_number() OVER (ORDER BY n DESC, v ASC) - 1 AS INTEGER) AS i
  FROM seg0
),
nseg AS (SELECT CAST(count(*) AS INTEGER) AS c FROM seg)
SELECT c_custkey, s.i AS slot,
       CASE WHEN c_mktsegment = s.v THEN 1.0 ELSE 0.0 END AS value
FROM customer CROSS JOIN seg s
UNION ALL
SELECT c_custkey, (SELECT c FROM nseg),
       CASE WHEN c_mktsegment IS NOT NULL
            AND c_mktsegment NOT IN (SELECT v FROM seg) THEN 1.0 ELSE 0.0 END
FROM customer
UNION ALL
SELECT c_custkey, (SELECT c FROM nseg) + 1,
       CASE WHEN c_mktsegment IS NULL THEN 1.0 ELSE 0.0 END
FROM customer
UNION ALL
SELECT c_custkey, (SELECT c FROM nseg) + 2,
       COALESCE(CAST(c_acctbal AS DOUBLE),
                (SELECT avg(c_acctbal) FROM customer))
FROM customer
UNION ALL
SELECT c_custkey, (SELECT c FROM nseg) + 3,
       CASE WHEN c_acctbal IS NULL THEN 1.0 ELSE 0.0 END
FROM customer
"""


ORACLES["asof_join"] = """
WITH l AS (
  SELECT user_id, event_id AS l_event, epoch_ms(ts) AS l_ms, value AS l_value
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, epoch_ms(ts) AS r_ms, max(value) AS r_value
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, epoch_ms(ts)
)
SELECT CAST(l.user_id AS BIGINT) AS user_id, CAST(l.l_event AS BIGINT) AS l_event,
       l.l_ms, l.l_value, r.r_ms AS r_matched_ms, r.r_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.l_ms >= r.r_ms
"""

ORACLES["cdc_scd2"] = """
WITH mx AS (SELECT max(event_id) AS m FROM events),
ch AS (
  SELECT user_id AS k, event_id AS ver, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
),
s1 AS (
  SELECT k, ver, value FROM (
    SELECT k, ver, value, op,
           row_number() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
    FROM ch WHERE ver <= (SELECT (m * 2) // 5 FROM mx)
  ) WHERE rn = 1 AND op <> 'D'
),
s2 AS (
  SELECT k, ver, value FROM (
    SELECT k, ver, value, op,
           row_number() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
    FROM ch WHERE ver <= (SELECT (m * 4) // 5 FROM mx)
  ) WHERE rn = 1 AND op <> 'D'
),
diff AS (
  SELECT COALESCE(n.k, o.k) AS k,
         CASE WHEN n.k IS NULL THEN o.ver ELSE n.ver END AS ver,
         CASE WHEN n.k IS NULL THEN NULL ELSE n.value END AS value,
         CASE WHEN o.k IS NULL THEN 'I'
              WHEN n.k IS NULL THEN 'D'
              WHEN o.ver IS DISTINCT FROM n.ver
                   OR o.value IS DISTINCT FROM n.value THEN 'U' END AS op
  FROM s1 o FULL JOIN s2 n ON o.k = n.k
)
SELECT 'snap1' AS part, CAST(k AS BIGINT) AS k, CAST(ver AS BIGINT) AS ver,
       CAST(value AS DOUBLE) AS value, CAST(NULL AS VARCHAR) AS op FROM s1
UNION ALL
SELECT 'snap2', CAST(k AS BIGINT), CAST(ver AS BIGINT),
       CAST(value AS DOUBLE), CAST(NULL AS VARCHAR) FROM s2
UNION ALL
SELECT 'diff', CAST(k AS BIGINT), CAST(ver AS BIGINT),
       CAST(value AS DOUBLE), op FROM diff WHERE op IS NOT NULL
UNION ALL
SELECT 'pit', CAST(k AS BIGINT), CAST(ver AS BIGINT),
       CAST(value AS DOUBLE), CAST(t AS VARCHAR)
FROM (
  SELECT p.k, p.t, c.ver, c.value, c.op,
         row_number() OVER (PARTITION BY p.k, p.t
                            ORDER BY c.ver DESC) AS rn
  FROM (SELECT user_id AS k, event_id - 1 AS t FROM events
        WHERE event_id % 7 = 0 AND event_id > 0) p
  JOIN ch c ON c.k = p.k AND c.ver <= p.t
) WHERE rn = 1 AND op <> 'D'
"""

ORACLES["top_k_by_group"] = """
WITH c AS (
  SELECT event_type, user_id, count(*) AS item_count
  FROM events GROUP BY event_type, user_id HAVING count(*) >= 2
),
r AS (
  SELECT event_type, user_id, item_count,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY item_count DESC, user_id ASC) AS rank
  FROM c
)
SELECT event_type, CAST(user_id AS BIGINT) AS user_id, item_count,
       CAST(rank AS INT) AS rank
FROM r WHERE rank <= 10
"""

# the direct single-pass daily rollup: the Spark side persisted hourly
# carrier partials to parquet in two halves, merged and finalized — the
# monoid laws make that equal this direct form
ORACLES["rollup_partials"] = """
SELECT epoch_ms(ts) - epoch_ms(ts) % 86400000 AS bucket_start_ms,
       event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total,
       min(value) AS vmin,
       max(value) AS vmax,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / count(value) AS vmean
FROM events
GROUP BY bucket_start_ms, event_type
"""

# KLL at k >= group size is the EXACT inclusive rank statistic: smallest
# value whose cumulative count / n >= q. CMS with 5 strings in 1000 buckets
# has no collisions: the estimate is the exact count.
ORACLES["sketch_quantiles"] = """
WITH btok AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
  FROM documents
),
bbg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                                       i -> tk[i] || ' ' || tk[i+1])) AS bg
  FROM btok
),
brv AS (
  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                                       i -> tk[i+1] || ' ' || tk[i])) AS bg
  FROM btok
),
bins AS (SELECT DISTINCT bg FROM bbg WHERE doc_id % 2 = 0),
bpos AS (
  SELECT DISTINCT p FROM (
    SELECT unnest([
      CAST(('0x' || substr(md5(bg || '#1000'), 1, 15)) AS BIGINT) % 4096,
      CAST(('0x' || substr(md5(bg || '#1001'), 1, 15)) AS BIGINT) % 4096,
      CAST(('0x' || substr(md5(bg || '#1002'), 1, 15)) AS BIGINT) % 4096
    ]) AS p FROM bins)
),
bwords AS (
  SELECT p // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
  FROM bpos GROUP BY 1
),
bprobe AS (
  SELECT DISTINCT bg
  FROM (SELECT bg FROM bbg UNION ALL SELECT bg FROM brv)
),
bppos AS (
  SELECT bg, len(ps) AS npos, unnest(ps) AS p
  FROM (SELECT bg, list_distinct([
      CAST(('0x' || substr(md5(bg || '#1000'), 1, 15)) AS BIGINT) % 4096,
      CAST(('0x' || substr(md5(bg || '#1001'), 1, 15)) AS BIGINT) % 4096,
      CAST(('0x' || substr(md5(bg || '#1002'), 1, 15)) AS BIGINT) % 4096
    ]) AS ps FROM bprobe)
),
bhits AS (
  SELECT bg, npos, count(*) FILTER (WHERE
           (COALESCE(w.bits, 0) & (CAST(1 AS BIGINT) << CAST(p % 32 AS INT)))
           = (CAST(1 AS BIGINT) << CAST(p % 32 AS INT))) AS nh
  FROM bppos LEFT JOIN bwords w ON bppos.p // 32 = w.word_idx
  GROUP BY bg, npos
),
d AS (
  SELECT event_type, value, count(*) AS cnt
  FROM events GROUP BY event_type, value
),
c AS (
  SELECT event_type, value,
         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE)
         / SUM(cnt) OVER (PARTITION BY event_type) AS cle
  FROM d
)
SELECT 'kll' AS part, event_type, CAST(NULL AS BIGINT) AS est,
       round(min(value) FILTER (WHERE cle >= 0.25), 6) AS q25,
       round(min(value) FILTER (WHERE cle >= 0.5), 6) AS q50,
       round(min(value) FILTER (WHERE cle >= 0.75), 6) AS q75
FROM c GROUP BY event_type
UNION ALL
SELECT 'cms', event_type, count(*), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM events GROUP BY event_type
UNION ALL
SELECT 'freq', event_type, count(*), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM events GROUP BY event_type
UNION ALL
SELECT 'bloom', bg, CAST(nh = npos AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM bhits
"""

ORACLES["ivf_topk_indexed"] = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 20),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, c.embedding::DOUBLE[]) AS cosine,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qv, c.embedding::DOUBLE[]) DESC,
                                     c.vec_id ASC) AS rank
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id != q.query_id
),
-- IVF-PQ index replica: identical quantizer model and arithmetic as
-- similarity_topk's pq_adc arm (nearest cell, residual argmin codes,
-- centroid+codeword reconstruction, 6dp-rounded cosine over each
-- query's single probed cell). The Spark side reads the codes from the
-- two-batch on-disk index — per-row injected-model encoding makes the
-- persisted form land on the same answer.
pcb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pctr AS (SELECT (SELECT v FROM pcb WHERE vec_id = 0) AS c0,
                (SELECT v FROM pcb WHERE vec_id = 1) AS c1),
pword AS (SELECT vec_id - 2 AS c, v FROM pcb
          WHERE vec_id >= 2 AND vec_id < 18),
pasg AS (
  SELECT vec_id, v,
         CASE WHEN list_sum(list_transform(generate_series(1, 64),
                     i -> (v[i] - c0[i]) * (v[i] - c0[i])))
                   <= list_sum(list_transform(generate_series(1, 64),
                     i -> (v[i] - c1[i]) * (v[i] - c1[i])))
              THEN 0 ELSE 1 END AS cell
  FROM pcb CROSS JOIN pctr
),
pres AS (
  SELECT a.vec_id, a.cell,
         list_transform(generate_series(1, 64),
           i -> a.v[i] - (CASE WHEN a.cell = 0 THEN ctr.c0
                               ELSE ctr.c1 END)[i]) AS res
  FROM pasg a CROSS JOIN pctr ctr
),
pqd AS (
  SELECT r.vec_id, j.j, w.c,
         list_sum(list_transform(generate_series(1, 8),
           t -> (r.res[j.j * 8 + t] - w.v[j.j * 8 + t])
                * (r.res[j.j * 8 + t] - w.v[j.j * 8 + t]))) AS d
  FROM pres r CROSS JOIN range(0, 8) j(j) CROSS JOIN pword w
),
pqsel AS (
  SELECT vec_id, j, c,
         row_number() OVER (PARTITION BY vec_id, j
                            ORDER BY d ASC, c ASC) AS rn
  FROM pqd
),
pqrec AS (
  SELECT s.vec_id,
         flatten(list(list_transform(generate_series(1, 8),
           t -> (CASE WHEN a.cell = 0 THEN ctr.c0 ELSE ctr.c1 END)
                  [s.j * 8 + t] + w.v[s.j * 8 + t])
           ORDER BY s.j)) AS rv
  FROM pqsel s JOIN pasg a USING (vec_id)
       JOIN pword w ON w.c = s.c CROSS JOIN pctr ctr
  WHERE s.rn = 1
  GROUP BY s.vec_id
),
pqq AS (
  SELECT q.query_id, q.qv,
         CASE WHEN list_sum(list_transform(generate_series(1, 64),
                     i -> (q.qv[i] - c0[i]) * (q.qv[i] - c0[i])))
                   <= list_sum(list_transform(generate_series(1, 64),
                     i -> (q.qv[i] - c1[i]) * (q.qv[i] - c1[i])))
              THEN 0 ELSE 1 END AS qcell
  FROM q CROSS JOIN pctr
),
pq_scored AS (
  SELECT qq.query_id, r.vec_id AS neighbor_id,
         round(list_cosine_similarity(qq.qv, r.rv), 6) AS cosine,
         row_number() OVER (PARTITION BY qq.query_id
                            ORDER BY round(list_cosine_similarity(qq.qv, r.rv), 6) DESC,
                                     r.vec_id ASC) AS rank
  FROM pqrec r JOIN pasg a USING (vec_id)
       JOIN pqq qq ON qq.qcell = a.cell
  WHERE r.vec_id != qq.query_id
)
SELECT 'full' AS part, CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(rank AS INT) AS rank, round(cosine, 6) + 0.0 AS cosine6
FROM scored WHERE rank <= 5
UNION ALL
SELECT 'pq', CAST(query_id AS BIGINT), CAST(neighbor_id AS BIGINT),
       CAST(rank AS INT), round(cosine, 6) + 0.0
FROM pq_scored WHERE rank <= 5
UNION ALL
-- part='stream': the streaming-ingest twin of the pq arm (same sidecar
-- model, per-row encoding) — the answer is identical by construction,
-- so the oracle is the same replica under the 'stream' label
SELECT 'stream', CAST(query_id AS BIGINT), CAST(neighbor_id AS BIGINT),
       CAST(rank AS INT), round(cosine, 6) + 0.0
FROM pq_scored WHERE rank <= 5
"""

ORACLES["stream_stream_join"] = """
WITH l AS (SELECT user_id, event_id, ts FROM events
           WHERE event_type = 'purchase'),
r AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
-- the global streaming watermark: min over the two inputs of
-- (max event time seen AFTER that input's filter) - delay
wm AS (SELECT least((SELECT max(ts) FROM l), (SELECT max(ts) FROM r))
              - INTERVAL 2 HOUR AS w)
SELECT CAST(l.user_id AS BIGINT) AS l_user,
       CAST(l.event_id AS BIGINT) AS l_event,
       CAST(r.event_id AS BIGINT) AS r_event
FROM l JOIN r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
UNION ALL
-- expiry nulls: unmatched purchases whose join upper bound the final
-- watermark strictly passed (trailing rows stay withheld)
SELECT CAST(l.user_id AS BIGINT), CAST(l.event_id AS BIGINT),
       CAST(NULL AS BIGINT)
FROM l
WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.user_id = l.user_id
                  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR)
  AND l.ts + INTERVAL 1 HOUR < (SELECT w FROM wm)
"""

# LOCO linear closed form (r6): OLS normal equations over EXACT integer
# aggregates in HUGEINT (mirror of the Python-bigint driver computation),
# coefficients cast to DOUBLE only at the final divisions, then the
# margin / delta / top-slot expressions replicated IEEE-op-for-op against
# ml/insights.loco_linear(link='identity').
ORACLES["loco_insights"] = """
WITH d AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c1,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(c1) AS HUGEINT) AS s1, CAST(sum(m) AS HUGEINT) AS s2,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(c1 * c1) AS HUGEINT) AS s11,
         CAST(sum(c1 * m) AS HUGEINT) AS s12,
         CAST(sum(c1 * y) AS HUGEINT) AS s1y,
         CAST(sum(m * m) AS HUGEINT) AS s22,
         CAST(sum(m * y) AS HUGEINT) AS s2y
  FROM d
),
c AS (
  SELECT n, s1, s2, sy,
         n*s11 - s1*s1 AS c11, n*s12 - s1*s2 AS c12, n*s22 - s2*s2 AS c22,
         n*s1y - s1*sy AS c1y, n*s2y - s2*sy AS c2y
  FROM s
),
coef AS (
  SELECT n, s1, s2, sy,
         CAST(c22*c1y - c12*c2y AS DOUBLE)
           / CAST(c11*c22 - c12*c12 AS DOUBLE) AS b1,
         CAST(c11*c2y - c12*c1y AS DOUBLE)
           / CAST(c11*c22 - c12*c12 AS DOUBLE) AS b2
  FROM c
),
cf AS (
  SELECT b1, b2,
         (CAST(sy AS DOUBLE) - b1 * CAST(s1 AS DOUBLE)
                             - b2 * CAST(s2 AS DOUBLE))
           / CAST(n AS DOUBLE) AS b0
  FROM coef
),
scored AS (
  -- margin mirrors loco_linear's fold: b0 + ((0.0 + t1) + t2);
  -- delta_i mirrors margin - (margin - t_i) WITHOUT algebraic
  -- simplification (IEEE subtraction order matters for bit equality)
  SELECT o_orderkey,
         b0 + (0.0 + CAST(c1 AS DOUBLE) * b1 + CAST(m AS DOUBLE) * b2)
           AS margin,
         CAST(c1 AS DOUBLE) * b1 AS t1,
         CAST(m AS DOUBLE) * b2 AS t2
  FROM d, cf
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       round(margin, 6) + 0.0 AS score6,
       CAST(CASE WHEN abs(margin - (margin - t2)) >
                      abs(margin - (margin - t1))
                 THEN 1 ELSE 0 END AS INT) AS top_slot,
       round(CASE WHEN abs(margin - (margin - t2)) >
                       abs(margin - (margin - t1))
                  THEN margin - (margin - t2)
                  ELSE margin - (margin - t1) END, 6) + 0.0 AS top_delta6
FROM scored
"""


# AT MOST 50 entries, hash-gated rows FIRST (the driver gates at most 50
# CORRECTNESS rows per round — it emitted 50 for a 54/55-entry registry in
# rounds 1 and 2, and r8 proved the cap again the hard way: inserting
# ner_trainable/lexicon_segment mid-dict grew the registry to 52 and
# silently pushed loco_insights (hash-green in r7) and model_selection past
# the gated window. r9 re-seat: conditional_reader merged into
# agg_reader_cutoff (join on key, both gates kept), model_selection merged
# into ml_train_score (both rows-only), rows-only entries moved LAST so a
# future insertion can never displace a hash-gated row, and a module-level
# guard below makes any violation an import error instead of silent
# evidence loss. Earlier slot-freeing merges for the same reason:
# string_indexer->onehot_topk, sort_limit->set_ops,
# agg_concat_mode_logical->agg_first_last, bin_score_calibration->
# binary_eval, map_vectorizer->map_monoid, text_similarity->
# stopwords_ngrams, dedup_near_ngram->dedup_clusters. When adding r9+
# gates, prefer new part= arms on existing rows over new registry keys.
SPARK_QUERIES = {
    "scan_pushdown": q_scan_pushdown,
    "pricing_summary": q_pricing_summary,
    "join_left_agg": q_join_left_agg,
    "join_outer_combined": q_join_outer_combined,
    "multiway_broadcast": q_multiway_broadcast,
    "sanity_checker": q_sanity_checker,
    "transmogrify_vector": q_transmogrify_vector,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "similarity_ann_lsh": q_similarity_ann_lsh,
    "dedup_simhash": q_dedup_simhash,
    "agg_reader_cutoff": q_agg_reader_cutoff,
    "agg_first_last": q_agg_first_last,
    "map_monoid": q_map_monoid,
    "filter_math_ops": q_filter_math_ops,
    "text_ops": q_text_ops,
    "date_ops": q_date_ops,
    "onehot_topk": q_onehot_topk,
    "set_ops": q_set_ops,
    "correlation_stats": q_correlation_stats,
    "joined_secondary_agg": q_joined_secondary_agg,
    "date_list_vectorizer": q_date_list_vectorizer,
    "geo_midpoint": q_geo_midpoint,
    "stopwords_ngrams": q_stopwords_ngrams,
    "multilabel_topn": q_multilabel_topn,
    "name_lang_detect": q_name_lang_detect,
    "ner_trainable": q_ner_trainable,
    "lexicon_segment": q_lexicon_segment,
    "raw_feature_filter": q_raw_feature_filter,
    "numeric_fitted": q_numeric_fitted,
    "binary_eval": q_binary_eval,
    "loco_insights": q_loco_insights,
    "mime_detector": q_mime_detector,
    # round-4 extension surfaces, oracle-gated (VERDICT r4 item 1)
    "asof_join": q_asof_join,
    "cdc_scd2": q_cdc_scd2,
    "top_k_by_group": q_top_k_by_group,
    "rollup_partials": q_rollup_partials,
    "sketch_quantiles": q_sketch_quantiles,
    "ivf_topk_indexed": q_ivf_topk_indexed,
    "stream_stream_join": q_stream_stream_join,
    "dedup_exact": q_dedup_exact,
    "dedup_clusters": q_dedup_clusters,
    "corpus_mixture": q_corpus_mixture,
    "retrieval_indexed": q_retrieval_indexed,
    "text_quality": q_text_quality,
    "similarity_topk": q_similarity_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "sessionize": q_sessionize,
    "streaming_window": q_streaming_window,
    # rows-only LAST (non-SQL-expressible: seeded hashing / ML / vectors)
    "text_ml_vectors": q_text_ml_vectors,
    "ml_train_score": q_ml_train_score_merged,
}

# Guard against the r8 failure mode: the driver checks only the FIRST
# _DRIVER_QUERY_CAP registry entries, so a hash-gated query past the cap
# (or a registry past the cap at all) silently loses its correctness row.
# Make that an import-time error.
_DRIVER_QUERY_CAP = 50
if len(SPARK_QUERIES) > _DRIVER_QUERY_CAP:
    raise AssertionError(
        f"SPARK_QUERIES has {len(SPARK_QUERIES)} entries; the driver only "
        f"gates the first {_DRIVER_QUERY_CAP} — merge queries (part= arms) "
        "instead of growing the registry")
_past_cap = [k for i, k in enumerate(SPARK_QUERIES)
             if i >= _DRIVER_QUERY_CAP and k in ORACLES]
if _past_cap:
    raise AssertionError(
        f"oracle-gated queries past the driver's {_DRIVER_QUERY_CAP}-row "
        f"cap would lose their correctness rows: {_past_cap}")
_orphan_oracles = sorted(set(ORACLES) - set(SPARK_QUERIES))
if _orphan_oracles:
    raise AssertionError(
        f"ORACLES entries without a registry query: {_orphan_oracles}")
