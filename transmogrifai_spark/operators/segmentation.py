"""Dictionary segmentation at DICTIONARY scale: the broadcast-join form of
``functions.text.lexicon_segment`` plus a loader for the public MeCab /
IPADIC dictionary format.

The plan-literal form (functions/text.py) binds the lexicon as one parsed
map expression — right for the 10²-10⁵-word dictionaries, but a
Kuromoji-scale dictionary (~400k entries,
utils/src/main/scala/com/salesforce/op/utils/text/LuceneTextAnalyzer.scala's
Japanese tier) would make the plan itself multi-MB and re-parse it per
query. ``lexicon_segment_join`` keeps the dictionary DATA — a DataFrame,
broadcast once — and runs the SAME Viterbi dp over the matched spans:

1. candidate spans: every substring of length 1..L at every position of
   each distinct text (map-side explode, no shuffle);
2. one BROADCAST hash join against the lexicon (word -> cost) — the only
   place the dictionary appears; candidates never shuffle;
3. matched arcs grouped per text (the only shuffle — arc lists are tiny
   relative to the candidate stream) and joined back;
4. the identical dp/backtrack expressions as ``lexicon_segment`` over the
   arc array — same costs, same (cost, earlier-start) tie-break, same
   IEEE addition order, so the two forms are bit-equal on any lexicon
   (law-tested in tests/test_segmentation_join.py).

At 100 TB: step 1 is embarrassingly parallel; step 2 broadcasts only the
dictionary (a few hundred MB for 400k entries — the size Kuromoji ships
as a jar asset); step 3 shuffles only matched arcs (|arcs| per doc ~
matched words, orders of magnitude below the candidate stream).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (_lattice_dp_typed_tokens,
                              _viterbi_backtrack_tokens)


def _arcs_dp_tokens(s: Column, arcs: Column, unknown_cost: float) -> Column:
    """Viterbi over an explicit arc list — the exact dp of
    ``lexicon_segment`` with the window-probe candidates replaced by the
    pre-joined arcs; the backtrack/token-slicing is the SHARED
    ``_viterbi_backtrack_tokens`` (one copy for both forms — the
    bit-equality law rides on it). ``arcs``:
    array<struct<i:int,j:int,c:double>> (dict matches; i/j are 0-based
    start / exclusive end). Single characters not covered by a
    single-char dict arc get an ``unknown_cost`` arc — the
    coalesce(dict, unknown) rule of the literal form."""
    n = F.length(s)

    def with_arcs(a: Column) -> Column:
        # group arcs by END position once: element j-1 holds the arcs
        # ending at j (bound as a lambda var so the filter sweep runs
        # once, not per dp step — the nbmodel bind-once rule)
        by_end = F.transform(
            F.sequence(F.lit(1), n),
            lambda j: F.filter(a, lambda e: e["j"] == j))

        def with_by_end(be: Column) -> Column:
            def step(acc: Column, j: Column) -> Column:
                ends = F.element_at(be, j)
                dict_cands = F.transform(
                    ends,
                    lambda e: F.struct(
                        (F.element_at(acc, e["i"] + 1)["cost"] + e["c"])
                        .alias("cost"),
                        e["i"].alias("bp")))
                has_single = F.exists(ends, lambda e: e["i"] == j - 1)
                unk = F.when(has_single, F.array().cast(
                    "array<struct<cost:double,bp:int>>")).otherwise(
                    F.array(F.struct(
                        (F.element_at(acc, j)["cost"]
                         + F.lit(float(unknown_cost))).alias("cost"),
                        (j - 1).cast("int").alias("bp"))))
                cands = F.concat(dict_cands, unk)
                return F.concat(acc, F.array(F.array_min(cands)))

            dp_expr = F.aggregate(
                F.sequence(F.lit(1), n),
                F.array(F.struct(F.lit(0.0).alias("cost"),
                                 F.lit(-1).cast("int").alias("bp"))),
                step)
            return _viterbi_backtrack_tokens(s, dp_expr, n)

        return F.get(F.transform(F.array(by_end), with_by_end), 0)

    out = F.get(F.transform(
        F.array(F.coalesce(
            arcs, F.array().cast("array<struct<i:int,j:int,c:double>>"))),
        with_arcs), 0)
    return F.when(s.isNull() | (F.length(s) == 0),
                  F.array().cast("array<string>")).otherwise(out)


def lexicon_segment_join(df: DataFrame, text_col: str,
                         lexicon_df: DataFrame,
                         out_col: str = "tokens",
                         word_col: str = "word", cost_col: str = "cost",
                         unknown_cost: float = 2.0,
                         max_word_len: int | None = None,
                         id_col: str | None = None) -> DataFrame:
    """Least-cost dictionary segmentation with the lexicon as DATA (a
    broadcast DataFrame) instead of a plan literal — the scale form
    promised by ``lexicon_segment``'s docstring for dictionaries past
    the ~10⁵-word plan-literal comfort zone (Kuromoji's Japanese
    dictionary is ~400k surface forms).

    ``lexicon_df``: (word_col string, cost_col double). Adds ``out_col``
    (array<string>) to ``df``; rows whose text is NULL/empty get an
    empty array. Result is bit-equal to
    ``lexicon_segment(F.col(text_col), {word: cost, ...})`` — same dp,
    same tie-breaks, same IEEE order (law-tested).

    ``max_word_len`` bounds candidate-span length; when omitted it is
    computed from the lexicon with one 1-row aggregate collect.

    Shuffle key: by default the arc lists group and join back ON THE
    TEXT VALUE (deduping shared texts for free — right for short CJK
    strings), and the dp itself runs ONCE PER DISTINCT TEXT with the
    token arrays joined back (r12: the dp is interpreted-HOF heavy, so
    evaluating it per input ROW after the join — the pre-r12 shape —
    forfeited the dedup exactly where it mattered most; under a Zipfian
    word stream this is the ``wordpiece_tokenize_df`` once-per-TYPE
    economics). Pass ``id_col`` naming a UNIQUE, NON-NULL id column to
    key the grouping/join on the id instead, so long documents never
    ride a shuffle as the key (the 100 TB form — rows are unique by
    contract there, so per-row IS per-key). A NULL id raises at
    evaluation time (it can never join its arcs back — the row would
    silently mis-segment as all-unknown otherwise); id UNIQUENESS is
    the caller's contract (duplicate ids would merge arc lists across
    different texts)."""
    spark = df.sparkSession
    lex = lexicon_df.select(F.col(word_col).cast("string").alias("__w"),
                            F.col(cost_col).cast("double").alias("__c"))
    if max_word_len is None:
        row = lex.agg(F.max(F.length("__w"))).first()  # 1-row bounded
        max_word_len = int(row[0] or 1)
    L = int(max_word_len)

    key = "__id" if id_col else "__t"
    if id_col:
        base = df.select(F.col(id_col).alias("__id"),
                         F.col(text_col).alias("__t"))
    else:
        base = df.select(F.col(text_col).alias("__t")).distinct()
    texts = base.where(F.col("__t").isNotNull() & (F.length("__t") > 0))
    # candidate spans: (key, i, j, word) for all 0 <= i < j <= n,
    # j - i <= L — map-side explodes, never shuffled (the broadcast
    # join keeps it local). r13: positions explode FIRST and the L spans
    # per position are derived in a PLAIN projection, so substr and the
    # struct building run under whole-stage CODEGEN — the r12 shape
    # built a per-doc nested array<struct> through two interpreted
    # transform lambdas, measured at ~2.4 us per candidate and 18-21 s
    # of the 23 s sf0.1 document gate (the dp was a bystander). Same
    # candidate set by construction: {(i, i+l, substr(i+1, l)) :
    # 0 <= i < n, 1 <= l <= L, i+l <= n}.
    pos = texts.select(
        key, "__t",
        F.explode(F.sequence(F.lit(0), F.length("__t") - 1)).alias("__i"))
    spans = pos.select(key, F.explode(F.array(*[
        F.when(F.col("__i") + l <= F.length("__t"),
               F.struct(F.col("__i").cast("int").alias("i"),
                        (F.col("__i") + l).cast("int").alias("j"),
                        F.substr(F.col("__t"), F.col("__i") + 1,
                                 F.lit(l)).alias("w")))
        for l in range(1, L + 1)])).alias("sp"))
    cands = spans.where(F.col("sp").isNotNull())
    arcs = (cands.join(F.broadcast(lex), cands["sp.w"] == lex["__w"])
            .groupBy(key)
            .agg(F.collect_list(F.struct(
                F.col("sp.i").alias("i"), F.col("sp.j").alias("j"),
                F.col("__c").alias("c"))).alias("__arcs")))
    if id_col:
        seg = _arcs_dp_tokens(F.col(text_col), F.col("__arcs"),
                              unknown_cost=unknown_cost)
        # a NULL id can never equi-join its arcs back — fail loudly at
        # evaluation time instead of silently segmenting all-unknown
        seg = F.when(
            df[id_col].isNull() & F.col(text_col).isNotNull()
            & (F.length(text_col) > 0),
            F.raise_error(F.lit(
                f"lexicon_segment_join: NULL in id_col {id_col!r} "
                "(ids must be unique and non-null)"))
            .cast("array<string>")).otherwise(seg)
        return (df.join(arcs, df[id_col] == arcs["__id"], "left")
                .drop("__id")
                .withColumn(out_col, seg)
                .drop("__arcs"))
    # text-value path: run the dp on the DISTINCT texts (left-joined
    # with their arcs so no-match texts still segment all-unknown) and
    # join the token arrays back — NULL/empty-text rows miss the join
    # and coalesce to the empty array, exactly the dp's own null/empty
    # branch
    typed = (texts.join(arcs, "__t", "left")
             .withColumn("__toks",
                         _arcs_dp_tokens(F.col("__t"), F.col("__arcs"),
                                         unknown_cost=unknown_cost))
             .select("__t", "__toks"))
    return (df.join(typed, df[text_col] == typed["__t"], "left")
            .drop("__t")
            .withColumn(out_col,
                        F.coalesce(F.col("__toks"),
                                   F.array().cast("array<string>")))
            .drop("__toks"))


def lexicon_segment_lattice_join(df: DataFrame, text_col: str,
                                 lexicon_df: DataFrame,
                                 conn: dict | None = None,
                                 out_col: str = "morphemes",
                                 word_col: str = "word",
                                 cost_col: str = "cost",
                                 cls_col: str = "cls",
                                 unknown_cost: float = 2.0,
                                 unknown_class: str = "UNK",
                                 max_word_len: int | None = None,
                                 id_col: str | None = None,
                                 max_classes: int = 48) -> DataFrame:
    """FULL-LATTICE segmentation (word cost + class connection cost —
    the complete Kuromoji/MeCab model of
    ``functions.text.lexicon_segment_lattice``) with the DICTIONARY as a
    broadcast DataFrame: Kuromoji-scale surfaces (~400k) with the cost
    model intact. The dictionary never appears as a plan literal — only
    the CLASS-level tables do (``conn`` stays a python dict: the
    connection matrix is |classes|²-sized, the small data; the lexicon
    is the big data).

    ``lexicon_df``: (word_col string, cost_col double, cls_col string).
    Adds ``out_col`` = array<struct<token:string, cls:string>>. The
    candidate mining / broadcast join / arc grouping are exactly
    ``lexicon_segment_join``'s; the dp is THE shared
    ``_lattice_dp_typed_tokens`` core with the map probe replaced by an
    arc lookup, so the result is bit-equal to the plan-literal lattice
    form on any dictionary (law-tested). Classes are collected bounded
    (one distinct pass, ``max_classes`` cap with a clean error — the dp
    is O(n·L·|classes|²); coarsen classes or use the class-free
    ``lexicon_segment_join`` past it). ``id_col``: as in
    ``lexicon_segment_join`` (unique non-null ids; NULL raises)."""
    conn = conn or {}
    lex = lexicon_df.select(F.col(word_col).cast("string").alias("__w"),
                            F.col(cost_col).cast("double").alias("__c"),
                            F.col(cls_col).cast("string").alias("__k"))
    cls_rows = [r[0] for r in
                lex.select("__k").distinct().limit(max_classes + 1).collect()]
    if len(cls_rows) > max_classes:
        raise ValueError(
            f"lexicon_segment_lattice_join is capped at {max_classes} "
            "distinct classes (the dp is O(n*L*C^2)); coarsen the class "
            "column or use lexicon_segment_join (word costs only)")
    classes = sorted(set(cls_rows) | {unknown_class})
    cidx = {cl: i for i, cl in enumerate(classes)}
    n_c = len(classes)
    unk_i = cidx[unknown_class]
    if max_word_len is None:
        row = lex.agg(F.max(F.length("__w"))).first()  # 1-row bounded
        max_word_len = int(row[0] or 1)
    L = int(max_word_len)
    conn_in = [[float(conn.get((classes[p], classes[t]), 0.0))
                for p in range(n_c)] for t in range(n_c)]
    bos_in = [float(conn.get(("BOS", classes[t]), 0.0)) for t in range(n_c)]
    eos_out = [float(conn.get((classes[p], "EOS"), 0.0))
               for p in range(n_c)]
    # class -> index via one parsed literal (never per-element F.lit)
    from ..util import sql_str_lit
    kmap = F.expr("map(" + ",".join(
        f"{sql_str_lit(cl)},{cidx[cl]}" for cl in classes) + ")")
    lexk = lex.select("__w", "__c",
                      F.element_at(kmap, F.col("__k")).alias("__ki"))

    key = "__id" if id_col else "__t"
    if id_col:
        base = df.select(F.col(id_col).alias("__id"),
                         F.col(text_col).alias("__t"))
    else:
        base = df.select(F.col(text_col).alias("__t")).distinct()
    texts = base.where(F.col("__t").isNotNull() & (F.length("__t") > 0))
    # codegen candidate mining — see lexicon_segment_join (r13)
    pos = texts.select(
        key, "__t",
        F.explode(F.sequence(F.lit(0), F.length("__t") - 1)).alias("__i"))
    spans = pos.select(key, F.explode(F.array(*[
        F.when(F.col("__i") + l <= F.length("__t"),
               F.struct(F.col("__i").cast("int").alias("i"),
                        (F.col("__i") + l).cast("int").alias("j"),
                        F.substr(F.col("__t"), F.col("__i") + 1,
                                 F.lit(l)).alias("w")))
        for l in range(1, L + 1)])).alias("sp"))
    cands = spans.where(F.col("sp").isNotNull())
    arcs = (cands.join(F.broadcast(lexk), cands["sp.w"] == lexk["__w"])
            .groupBy(key)
            .agg(F.collect_list(F.struct(
                F.col("sp.i").alias("i"), F.col("sp.j").alias("j"),
                F.col("__c").alias("c"), F.col("__ki").alias("k")))
                .alias("__arcs")))

    def seg_with_arcs(s: Column, arcs_col: Column) -> Column:
        def with_arcs(a: Column) -> Column:
            n = F.length(s)
            by_end = F.transform(
                F.sequence(F.lit(1), n),
                lambda j: F.filter(a, lambda e: e["j"] == j))

            def with_by_end(be: Column) -> Column:
                def entry_at(i: Column, j: Column) -> Column:
                    hit = F.try_element_at(
                        F.filter(F.element_at(be, j),
                                 lambda e: e["i"] == i), F.lit(1))
                    return F.when(hit.isNotNull(),
                                  F.struct(hit["c"].alias("c"),
                                           hit["k"].alias("k")))

                return _lattice_dp_typed_tokens(
                    s, entry_at, L=L, n_c=n_c, unk_i=unk_i,
                    conn_in=conn_in, bos_in=bos_in, eos_out=eos_out,
                    classes=classes, unknown_cost=unknown_cost)

            return F.get(F.transform(F.array(by_end), with_by_end), 0)

        out = F.get(F.transform(F.array(a_empty(arcs_col)), with_arcs), 0)
        return F.when(
            s.isNull() | (F.length(s) == 0),
            F.array().cast("array<struct<token:string,cls:string>>")) \
            .otherwise(out)

    def a_empty(a: Column) -> Column:
        return F.coalesce(
            a, F.array().cast("array<struct<i:int,j:int,c:double,k:int>>"))

    if id_col:
        seg = seg_with_arcs(F.col(text_col), F.col("__arcs"))
        seg = F.when(
            df[id_col].isNull() & F.col(text_col).isNotNull()
            & (F.length(text_col) > 0),
            F.raise_error(F.lit(
                f"lexicon_segment_lattice_join: NULL in id_col {id_col!r} "
                "(ids must be unique and non-null)"))
            .cast("array<struct<token:string,cls:string>>")).otherwise(seg)
        return (df.join(arcs, df[id_col] == arcs["__id"], "left")
                .drop("__id")
                .withColumn(out_col, seg)
                .drop("__arcs"))
    # text-value path: dp once per DISTINCT text, morpheme arrays joined
    # back (see lexicon_segment_join — the r12 per-type dp relocation)
    typed = (texts.join(arcs, "__t", "left")
             .withColumn("__toks",
                         seg_with_arcs(F.col("__t"), F.col("__arcs")))
             .select("__t", "__toks"))
    return (df.join(typed, df[text_col] == typed["__t"], "left")
            .drop("__t")
            .withColumn(out_col, F.coalesce(
                F.col("__toks"),
                F.array().cast(
                    "array<struct<token:string,cls:string>>")))
            .drop("__toks"))


# ---------------------------------------------------------------------------
# MeCab / IPADIC public dictionary format
# ---------------------------------------------------------------------------

def load_mecab_dict(spark, path: str) -> DataFrame:
    """Read MeCab/IPADIC-format dictionary CSV (the public format of the
    data Kuromoji ships compiled into its jar): one row per surface
    form, ``surface,left_id,right_id,word_cost,pos1[,pos2,...]``.
    Returns (word string, left_id int, right_id int, cost double,
    cls string) where ``cls`` is the first POS column — the class key
    ``lexicon_segment_lattice`` dispatches connection costs on.

    The reference wires this data through Lucene's Kuromoji analyzer
    (utils/.../text/LuceneTextAnalyzer.scala); here the user SUPPLIES
    the dictionary (public-knowledge constraint: algorithm in code,
    data at the caller's choice) and this loader closes the "parse it
    yourself" gap."""
    raw = spark.read.csv(path, header=False, inferSchema=False)
    cols = raw.columns
    need = 5
    if len(cols) < need:
        raise ValueError(
            f"MeCab dictionary CSV needs >= {need} columns "
            "(surface,left_id,right_id,cost,pos1[,...]); got "
            f"{len(cols)}")
    return raw.select(
        F.col(cols[0]).cast("string").alias("word"),
        F.col(cols[1]).cast("int").alias("left_id"),
        F.col(cols[2]).cast("int").alias("right_id"),
        F.col(cols[3]).cast("double").alias("cost"),
        F.col(cols[4]).cast("string").alias("cls"))


def load_mecab_matrix(spark, path: str) -> DataFrame:
    """Read a MeCab ``matrix.def`` connection-cost matrix: first line
    ``<n_right> <n_left>``, then ``right_id left_id cost`` triples —
    cost of placing a word whose LEFT context id is ``left_id`` after a
    word whose RIGHT context id is ``right_id``. Returns
    (right_id int, left_id int, cost double)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (lines
            .where(F.size(parts) == 3)  # skips the header pair + blanks
            .select(parts[0].cast("int").alias("right_id"),
                    parts[1].cast("int").alias("left_id"),
                    parts[2].cast("double").alias("cost"))
            .where(F.col("right_id").isNotNull()
                   & F.col("left_id").isNotNull()
                   & F.col("cost").isNotNull()))


def mecab_lattice_model(dict_df: DataFrame, matrix_df: DataFrame,
                        max_words: int = 200_000,
                        bos_id: int = 0) -> tuple[dict, dict]:
    """Assemble ``lexicon_segment_lattice`` inputs from loaded MeCab
    tables: returns (lexicon, conn) where lexicon = word -> (cost,
    class) and conn = (prev_class, class) -> cost.

    MeCab keys connections by context ID, not POS: two words sharing a
    POS can carry different ids. To stay EXACT, the class key is the
    word's ``"left:right"`` id pair — conn[(p, c)] is then
    matrix[right(p), left(c)] with no approximation; BOS/EOS use
    ``bos_id`` (0 in every public MeCab distribution). The dp cost is
    O(n·L·|classes|²), so this exact form fits fixture-to-mid-size
    dictionaries; for full IPADIC run ``lexicon_segment_join`` (word
    costs only) or supply a coarsened class map. Collects are bounded:
    the dictionary collect is capped at ``max_words`` (clean error past
    it) and the matrix collect is pruned to the id pairs the capped
    dictionary actually uses."""
    rows = dict_df.limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"mecab_lattice_model collects the dictionary driver-side and "
            f"is capped at {max_words} words; use lexicon_segment_join "
            "for larger dictionaries")
    lexicon = {}
    cls_of = {}
    for r in rows:
        cls = f"{int(r['left_id'])}:{int(r['right_id'])}"
        lexicon[r["word"]] = (float(r["cost"]), cls)
        cls_of[cls] = (int(r["left_id"]), int(r["right_id"]))
    used_right = {rid for (_, rid) in cls_of.values()} | {bos_id}
    used_left = {lid for (lid, _) in cls_of.values()} | {bos_id}
    # prune via broadcast semi-joins, not isin: Column.isin builds one
    # py4j literal per value (~3 s per few thousand — the measured
    # plan-cost rule), and a real dictionary has thousands of context ids
    spark = matrix_df.sparkSession
    r_df = spark.createDataFrame([(i,) for i in sorted(used_right)],
                                 "right_id int")
    l_df = spark.createDataFrame([(i,) for i in sorted(used_left)],
                                 "left_id int")
    mrows = (matrix_df
             .join(F.broadcast(r_df), "right_id", "semi")
             .join(F.broadcast(l_df), "left_id", "semi")
             .collect())
    m = {(int(r["right_id"]), int(r["left_id"])): float(r["cost"])
         for r in mrows}
    conn: dict[tuple[str, str], float] = {}
    for p, (_, p_rid) in cls_of.items():
        for c, (c_lid, _) in cls_of.items():
            w = m.get((p_rid, c_lid))
            if w is not None:
                conn[(p, c)] = w
    for c, (c_lid, _) in cls_of.items():
        w = m.get((bos_id, c_lid))
        if w is not None:
            conn[("BOS", c)] = w
    for p, (_, p_rid) in cls_of.items():
        w = m.get((p_rid, bos_id))
        if w is not None:
            conn[(p, "EOS")] = w
    return lexicon, conn
