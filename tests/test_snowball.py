"""Full Snowball stemmers de/fr/es (functions/snowball.py) — the three
backends (Catalyst expressions, DuckDB SQL, Python) are generated from
ONE spec by one interpreter; these tests pin the Python arm on known
Snowball behavior and law-test Spark == Python and DuckDB == Python.

Reference: utils/src/main/scala/com/salesforce/op/utils/text/
LuceneTextAnalyzer.scala — the per-language analyzer registry whose
stemming tier the reference routes de/fr/es text through.
"""
import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transmogrifai_spark.functions.snowball import (
    snowball_spark_sql, snowball_sql_ctes, snowball_stem,
    snowball_stem_py)

_PINNED = {
    "de": [
        ("bedürfnissen", "bedurfnis"),     # step1 en + niss undouble
        ("abenteuer", "abenteu"),          # u-marking + step1 er
        ("aufeinander", "aufeinand"),
        ("kategorie", "kategori"),
        ("verhältnisse", "verhaltnis"),
        ("großes", "gross"),               # ß prelude + es
        ("arbeitest", "arbeit"),           # step2 est
        ("billigung", "billig"),           # step3 ung
        ("ewigkeit", "ewig"),              # step3 keit
        ("freundlichkeit", "freundlich"),  # keit, lich outside R2
        ("schönheit", "schonheit"),        # heit outside R2 + umlaut
        ("kindisch", "kindisch"),          # isch outside R2
        ("quellen", "quell"),
    ],
    "fr": [
        ("abandonnée", "abandon"),         # 2b ée + undouble onn
        ("majestueux", "majestu"),         # step1 eux in R2
        ("continuation", "continu"),       # step1 ation
        ("continuellement", "continuel"),  # ement in RV + undouble ell
        ("payaient", "pai"),               # prelude Y/I + 2b aIent + Y->i
        ("finissions", "fin"),             # 2a issions after non-vowel
        ("parlerions", "parl"),            # RV exception 'par' + 2b
        ("logiquement", "logiqu"),         # ement, iqU kept outside R2
        ("nationaux", "national"),         # aux -> al in R1
        ("eaux", "eau"),                   # eaux -> eau, unconditional
        ("généreuses", "géner"),           # euses in R2
        ("vendeuse", "vendeux"),           # euse -> eux in R1 only
        ("aiguë", "aigu"),                 # step4 ë after gu
        ("créations", "création"),         # step4 s-removal, ion kept
        ("activité", "activ"),             # ité + iv chain
    ],
    "sv": [
        ("klubbarna", "klubb"),            # step1 arna
        ("jackorna", "jack"),
        ("betydelse", "betyd"),            # step1 e + step3 els
        ("skolans", "skolan"),             # s after valid s-ending
        ("möjligheterna", "möj"),          # heterna + step3 lig
        ("vackraste", "vackr"),            # aste
        ("fullt", "fullt"),                # fullt->full blocked: R1 short
        ("friskt", "frisk"),               # step2 kt undouble
        ("översättningen", "översättning"),
    ],
    "no": [
        ("forskningens", "forskning"),     # ens
        ("bilene", "bil"),                 # ene
        ("klokken", "klokk"),              # en
        ("merkert", "merker"),             # ert -> er
        ("sikkerhetslov", "sikker"),       # step3 hetslov
        ("mulighetene", "mulig"),          # hetene + (no ig rule fires)
        ("huset", "hus"),                  # et
        ("viktigst", "viktigst"),          # no danish igst rule in no
    ],
    "da": [
        ("undersøgelse", "undersøg"),      # e + step3 els
        ("mulighederne", "mulighed"),      # erne
        ("billigst", "bil"),               # igst + step3 lig
        ("væggene", "væg"),                # ene + undouble gg
        ("kattene", "kat"),                # ene + undouble tt
        ("huset", "hus"),
        ("vigtigste", "vigt"),             # e + igst + ig
        ("løst", "løst"),                  # løst->løs blocked: R1 short
    ],
    "ru": [
        ("книгами", "книг"),               # noun ами
        ("красивый", "красив"),            # adjective ый
        ("делающий", "дела"),              # adjective + participle ющ (а-)
        ("важная", "важн"),                # adjective ая
        ("возможность", "возможн"),        # noun ь + derivational ост
        ("читавшись", "чита"),             # perfective gerund вшись (а-)
        ("пересказывают", "пересказыва"),  # verb ют after а
        ("интереснейшее", "интересн"),     # adjective ее + step4 ейш
        ("прочитанный", "прочита"),        # adjectival + нн participle
        ("быстрее", "быстр"),
    ],
    "nl": [
        ("lichamelijk", "licham"),         # lijk + step2 re-run
        ("lichamelijkheden", "licham"),    # heden->heid, heid, lijk
        ("lopen", "lop"),                  # en after valid ending
        ("katten", "kat"),                 # en + tt undouble
        ("maan", "man"),                   # step4 CVD double vowel
        ("brood", "brod"),
        ("duizeligheid", "duizel"),        # heid + ig
        ("uitdrukking", "uitdruk"),        # ing + kk undouble
        ("bruikbaar", "bruikbar"),         # baar outside R2, step4
        ("vruchtbar", "vruchtbar"),        # bar gated on step2's e flag
        ("verduidelijken", "verduid"),
        ("belangrijkste", "belangrijkst"),
    ],
    "it": [
        ("abbandonata", "abbandon"),       # step2 ata
        ("pronunciarla", "pronunc"),       # step0 la after ar -> +e
        ("mangiandolo", "mang"),           # step0 lo after ando
        ("portarglielo", "port"),          # step0 glielo after ar
        ("organizzazione", "organizz"),    # azione in R2
        ("felicità", "felic"),             # ità; ic outside R2
        ("attivamente", "attiv"),          # amente in R1
        ("biologia", "biolog"),            # logia -> log
        ("crocchio", "crocc"),             # 3a vowel+i, 3b ch -> c
        ("abbaiamo", "abba"),              # prelude I + verb Iamo
        ("comprendiamo", "comprend"),
        ("finirebbero", "fin"),
    ],
    "es": [
        ("lograba", "logr"),               # 2b aba
        ("generosas", "gener"),            # step1 osas in R2
        ("comprándoselo", "compr"),        # step0 selo + ándo un-accent
        ("luchándole", "luch"),            # step0 le + ándo
        ("bebiéndose", "beb"),             # step0 se + iéndo
        ("dándoselas", "dandosel"),        # pronoun form outside RV
        ("huyendo", "huyend"),             # yendo outside RV, step3 o
        ("cómodamente", "comod"),          # amente in R1
        ("felicidades", "felic"),          # idades + ic outside R2
        ("torneadores", "torneador"),      # adores outside R2, 2b es
        ("argüir", "argü"),                # 2b ir; ü survives postlude
        ("pudieron", "pud"),               # 2b ieron
        ("tuyos", "tuy"),                  # step3 os
        ("generalidades", "general"),
    ],
    # r11 wave 4 (hand-walked through the published algorithms)
    "pt": [
        ("quilométricas", "quilométr"),    # step1 icas in R2
        ("falarão", "fal"),                # nasal prelude + 2 ara~o
        ("amoroso", "amor"),               # step1 oso
        ("felicidade", "felic"),           # idade, ic outside R2
        ("lógica", "lógic"),               # step4 residual a
        ("comeu", "com"),                  # step2 eu
        ("proposição", "proposiçã"),       # step4 o + postlude ã
        ("abandonaram", "abandon"),        # step2 aram
        ("felizmente", "feliz"),           # mente in R2
        ("generosidade", "generos"),       # idade (os is not a chain)
        ("administrativas", "administr"),  # ivas + at chain
        ("espécie", "espéc"),              # step5 e + ci rule
        ("comíamos", "com"),               # step2 íamos
        ("irmão", "irmã"),                 # step4 o under the ~ mark
        ("capazes", "capaz"),
    ],
    "ro": [
        ("copilul", "copil"),              # step0 ul
        ("frumoasă", "frumoas"),           # oasă outside R2, step4 ă
        ("abilitate", "abil"),             # step2 itate (step1 R1-blocked)
        ("lucrările", "lucrăr"),           # step0 ile->i + step4 i
        ("importantă", "import"),          # step2 antă
        ("jucători", "jucat"),             # step1 ători->at
        ("folosire", "folos"),             # step3 ire after consonant
        ("acţiunea", "acţiun"),            # step0 ea->e + step4 e
        ("naţional", "naţional"),
    ],
    "fi": [
        ("kirjasta", "kirj"),              # step3 sta + 6b cX
        ("taloissa", "talo"),              # step3 ssa + step5 i
        ("suurimmat", "suurim"),           # step5 t + 6b + 6e mm
        ("aatonaatto", "aatonaato"),       # 6e double consonant
        ("taloissammeko", "talo"),         # step1 ko + step2 mme
        ("nopeasti", "nopeast"),           # sti R2-blocked, 6b i
        ("talon", "talo"),                 # step3 n
        ("kalaa", "kala"),                 # step3 a after cv
        ("taloihin", "talo"),              # step3 hin after i
        ("tyttöjen", "tyttöj"),            # step3 n + 6b e
        ("edellytyksellä", "edellytyks"),
    ],
    "hu": [
        ("házakat", "ház"),                # case at + plural ak
        ("szállodában", "szállod"),        # case ban + á->a + owner a
        ("gépekkel", "gép"),               # instrum el + undouble kk
        ("fáknak", "fák"),                 # ák outside R1 stays
        ("asszonnyal", "asszony"),         # instrum al + nny undouble
        ("könyvet", "könyv"),              # case et
        ("barátaimmal", "barát"),          # case val... aim plur owner
        ("városok", "város"),              # plural ok
        ("kertjeinkben", "kert"),          # case ben + jeink
        ("emberek", "ember"),              # plural ek
    ],
}


def test_python_mirror_pinned():
    bad = [(lg, w, snowball_stem_py(w, lg), want)
           for lg, cases in _PINNED.items()
           for w, want in cases if snowball_stem_py(w, lg) != want]
    assert bad == []


@pytest.mark.parametrize("lang", sorted(_PINNED))
def test_expression_matches_pinned(spark, lang):
    cases = _PINNED[lang]
    df = spark.createDataFrame([(w,) for w, _ in cases], "w string")
    got = {r["w"]: r["s"] for r in
           df.select("w", snowball_stem(F.col("w"), lang).alias("s"))
           .collect()}
    bad = [(w, got[w], want) for w, want in cases if got[w] != want]
    assert bad == []


@pytest.mark.parametrize("lang", sorted(_PINNED))
def test_sql_replica_matches_mirror_pinned(lang):
    words = [w for w, _ in _PINNED[lang]]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS "
                f"SELECT unnest(range({len(words)})) AS doc_id")
    arr = "[" + ",".join("'" + w + "'" for w in words) + "]"
    ctes, fin = snowball_sql_ctes(
        lang, f"({arr})[CAST(doc_id + 1 AS INT)]", "sb")
    rows = con.execute(
        f"WITH {ctes} SELECT w0, stem FROM {fin}").fetchall()
    assert {w: s for w, s in rows} == \
        {w: snowball_stem_py(w, lang) for w in words}


@pytest.mark.parametrize("lang", sorted(_PINNED))
def test_spark_sql_text_backend_matches_mirror(spark, lang):
    """The F.expr text form (the fast-build driver-gate path) stems
    exactly like the mirror — fourth backend, same rule tables."""
    words = [w for w, _ in _PINNED[lang]] + ["", "x", "qq"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["s"] for r in
           df.select("w", F.expr(snowball_spark_sql(lang, "w"))
                     .alias("s")).collect()}
    assert got == {w: snowball_stem_py(w, lang) for w in words}


@pytest.mark.parametrize("lang", sorted(_PINNED))
def test_step_backend_matches_mirror(spark, lang):
    """The STEP backend (snowball_spark_steps — the r12 driver-gate
    path: chain of small parsed step/chunk expressions applied as
    withColumn projections) stems exactly like the mirror — fifth
    backend, same rule tables."""
    from transmogrifai_spark.functions.snowball import \
        snowball_spark_steps
    words = [w for w, _ in _PINNED[lang]] + ["", "x", "qq"]
    steps, fin = snowball_spark_steps(lang)
    df = spark.createDataFrame([(w,) for w in words], "w string") \
        .withColumn("w0", F.col("w"))
    for name, val in steps:
        df = df.withColumn(name, F.expr(val))
    got = {r["w"]: r["s"] for r in
           df.selectExpr("w", f"({fin}) AS s").collect()}
    assert got == {w: snowball_stem_py(w, lang) for w in words}


@pytest.mark.slow
def test_expression_null_passthrough(spark):
    df = spark.createDataFrame([(None,), ("",)], "w string")
    for lang in sorted(_PINNED):
        got = [r["s"] for r in
               df.select(snowball_stem(F.col("w"), lang).alias("s"))
               .collect()]
        assert got == [None, ""]


def test_german2_variant_folds_umlaut_digraphs():
    assert snowball_stem_py("loesungen", "de", variant="german2") == \
        snowball_stem_py("lösungen", "de")
    # ue after q is NOT folded
    assert snowball_stem_py("quellen", "de", variant="german2") == \
        snowball_stem_py("quellen", "de")


_ALPHA = {
    "de": "abcdefghiklmnorstuzäöüß",
    "fr": "abcdefgilmnopqrstuvyzçéèêëïâùû",
    "es": "abcdefgilmnoprstuyzáéíóúüñ",
    "sv": "abdefghiklmnorstuvyäåö",
    "no": "abdefghiklmnorstuvyæåø",
    "da": "abdefghiklmnorstuvyzæåø",
    "ru": "абвгдежиклмнопрстуüыьэюяйшщ",
    "it": "abcdefgilmnopqrstuvzàèìòù",
    "nl": "abdefghijklmnoprstuvwyzëé",
    "pt": "abcdefgilmnopqrstuvzáéíóúâêôãõç",
    "ro": "abcdefgilmnoprstuvzăâîşţțș",
    "fi": "adehijklmnoprstuvyäö",
    "hu": "abcdefgiklmnoprstvzáéíóöőúüű",
}
_TAILS = {
    "de": ["", "e", "en", "ern", "er", "em", "es", "s", "est", "st",
           "end", "ung", "ig", "ik", "isch", "lich", "heit", "keit",
           "igkeit", "lichkeit", "erung", "nisse", "igung"],
    "fr": ["", "s", "e", "es", "ement", "ements", "amment", "emment",
           "ment", "ments", "ance", "iques", "atrice", "ateurs",
           "ation", "logies", "usion", "ences", "ité", "ités", "if",
           "ives", "eaux", "aux", "euse", "euses", "issement", "ir",
           "issante", "irons", "issions", "é", "ée", "èrent",
           "eraient", "assions", "ions", "ion", "ier", "ière", "ent",
           "aient", "guë"],
    "es": ["", "s", "es", "os", "a", "o", "anza", "icos", "able",
           "ista", "oso", "amiento", "adora", "ación", "antes",
           "ancia", "logías", "ución", "encias", "amente", "mente",
           "idad", "idades", "iva", "ivos", "ando", "iendo",
           "ándolo", "iéndosela", "árselas", "érselo", "yendo",
           "aba", "arían", "iésemos", "áis", "emos", "en", "é", "ó",
           "ya", "yeron", "uyen", "gue"],
    "sv": ["", "a", "arna", "erna", "heterna", "orna", "ade", "ande",
           "aste", "anden", "heten", "heter", "arnas", "hetens",
           "andet", "ast", "s", "es", "lig", "ig", "els", "löst",
           "fullt", "tt", "dt"],
    "no": ["", "a", "e", "ede", "ande", "ende", "ane", "ene",
           "hetene", "en", "heten", "ar", "er", "heter", "as", "es",
           "hetenes", "ens", "ets", "et", "ast", "s", "erte", "ert",
           "hetslov"],
    "da": ["", "hed", "ethed", "ered", "e", "erede", "ende",
           "erende", "ene", "erne", "ere", "en", "heden", "eren",
           "er", "heder", "heds", "endes", "ernes", "hedens", "et",
           "s", "igst", "løst", "elig"],
    "ru": ["", "а", "ами", "ая", "ый", "ой", "ого", "ыми", "ейшее",
           "ость", "остью", "и", "ями", "ях", "ь", "ю", "я",
           "вшись", "ывшись", "ла", "ете", "ют", "уют", "ить",
           "нный"],
    "it": ["", "a", "e", "i", "o", "anza", "ici", "iche", "ismo",
           "abile", "ista", "oso", "mente", "atrice", "azione",
           "atori", "logia", "uzione", "enza", "amento", "amente",
           "ità", "ivo", "ando", "endo", "arla", "andolo", "arglielo",
           "iamo", "erebbero", "ata", "uta", "irò", "chi", "ghi"],
    "nl": ["", "e", "en", "ene", "s", "se", "heden", "heid", "end",
           "ing", "ig", "lijk", "baar", "bar", "tje", "kken",
           "tten", "dden", "igheid", "elijk", "eren", "aar", "ood",
           "aan", "uur"],
    "pt": ["", "s", "es", "a", "o", "icos", "ável", "ista", "oso",
           "amento", "adoras", "ação", "ções", "ante", "logias",
           "ução", "ências", "amente", "mente", "idades", "ivas",
           "iras", "aram", "ará", "ássemos", "íamos", "ão", "eu",
           "é", "gue", "cie", "ç"],
    "ro": ["", "ul", "ului", "aua", "ele", "elor", "ii", "iile",
           "ilor", "ile", "atei", "aţie", "abilitate", "ivitate",
           "icitate", "icatori", "ativ", "ător", "itiv", "ată",
           "abilă", "oase", "antă", "itate", "ivă", "ută", "ită",
           "iune", "işti", "are", "ând", "ează", "eşte", "eam",
           "aserăm", "userăm", "âse", "seserăţi", "ăm", "iţi", "ie",
           "ă"],
    "fi": ["", "kin", "kaan", "ko", "han", "sti", "si", "ni", "nsa",
           "mme", "an", "en", "han", "hin", "siin", "den", "seen",
           "a", "tta", "ssa", "sta", "lla", "lle", "na", "ksi", "n",
           "t", "impi", "mpi", "mma", "eja", "i", "j", "oj", "jo",
           "tto", "kkaa", "lä", "ttä"],
    "hu": ["", "al", "el", "ban", "ben", "nak", "val", "tól", "ból",
           "hoz", "ig", "at", "ot", "ért", "képpen", "kor", "ul",
           "vá", "onként", "ként", "en", "n", "t", "án", "ánként",
           "én", "astul", "stül", "á", "é", "aké", "ké", "éi",
           "ünk", "juk", "em", "od", "ja", "a", "e", "ánk", "ém",
           "jaim", "eim", "id", "jai", "aink", "itek", "ik", "ák",
           "ék", "ok", "k", "kkal", "ccsel"],
}


def _words(lang):
    return st.one_of(
        st.text(alphabet=_ALPHA[lang], min_size=1, max_size=12),
        st.tuples(st.text(alphabet=_ALPHA[lang], min_size=1,
                          max_size=7),
                  st.sampled_from(_TAILS[lang]))
        .map(lambda p: p[0] + p[1]))


@pytest.mark.slow
@pytest.mark.parametrize("lang", sorted(_PINNED))
@settings(max_examples=20, deadline=None)
@given(data=st.data())
def test_expression_equals_mirror_on_random_words(spark, lang, data):
    """THE law: the Catalyst chain stems every random word exactly like
    the Python interpretation of the same rule tables."""
    words = data.draw(st.lists(_words(lang), min_size=1, max_size=40,
                               unique=True))
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["s"] for r in
           df.select("w", snowball_stem(F.col("w"), lang).alias("s"))
           .collect()}
    assert got == {w: snowball_stem_py(w, lang) for w in words}


@pytest.mark.parametrize("lang", sorted(_PINNED))
@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_sql_replica_equals_mirror_on_random_words(lang, data):
    words = data.draw(st.lists(_words(lang), min_size=1, max_size=60,
                               unique=True))
    words = [w for w in words if "'" not in w]
    if not words:
        return
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS "
                f"SELECT unnest(range({len(words)})) AS doc_id")
    arr = "[" + ",".join("'" + w + "'" for w in words) + "]"
    ctes, fin = snowball_sql_ctes(
        lang, f"({arr})[CAST(doc_id + 1 AS INT)]", "sb")
    rows = con.execute(
        f"WITH {ctes} SELECT w0, stem FROM {fin}").fetchall()
    assert {w: s for w, s in rows} == \
        {w: snowball_stem_py(w, lang) for w in words}


def test_analyze_routes_de_fr_es_through_snowball(spark):
    from transmogrifai_spark.functions.text import analyze
    df = spark.createDataFrame(
        [("die schönheit der bedürfnisse",
          "la continuation des créations majestueux",
          "las felicidades generosas lograba")],
        "de string, fr string, es string")
    row = df.select(
        analyze(F.col("de"), "de").alias("de"),
        analyze(F.col("fr"), "fr").alias("fr"),
        analyze(F.col("es"), "es").alias("es")).first()
    assert row["de"] == ["schonheit", "bedurfnis"]
    assert row["fr"] == ["continu", "création", "majestu"]
    assert row["es"] == ["felic", "gener", "logr"]


def test_distinct_element_transform_equals_direct(spark):
    """The type-level dedup form (util.distinct_element_transform)
    stems exactly like a direct F.transform — including repeated
    tokens, NULL elements (position-preserved), and empty/NULL arrays."""
    from transmogrifai_spark.util import distinct_element_transform
    rows = [(1, ["casas", "gatos", "casas", "informações"]),
            (2, ["administrativas", None, "comeu"]),
            (3, []), (4, None), (5, ["casas"])]
    df = spark.createDataFrame(rows, "i long, a array<string>")
    fn = lambda t: snowball_stem(t, "pt")
    direct = {r["i"]: r["s"] for r in df.select(
        "i", F.transform("a", fn).alias("s")).collect()}
    via = {r["i"]: r["o"] for r in distinct_element_transform(
        df, "a", fn, "i", "o").select("i", "o").collect()}
    # direct transform of NULL array is NULL; the df form normalizes
    # to [] (documented) — compare with that normalization
    direct = {k: (v if v is not None else []) for k, v in direct.items()}
    assert via == direct


def test_distinct_element_transform_null_id_raises(spark):
    """A NULL id with a non-empty array can never equi-join its
    regrouped result back — the guard raises instead of silently
    returning array() (VERDICT r11 'What's wrong' #1)."""
    import pytest
    from transmogrifai_spark.util import distinct_element_transform
    fn = lambda t: snowball_stem(t, "pt")
    df = spark.createDataFrame([(1, ["casas"]), (None, ["gatos"])],
                               "i long, a array<string>")
    out = distinct_element_transform(df, "a", fn, "i", "o")
    with pytest.raises(Exception, match="NULL in id_col"):
        out.collect()
    # NULL id with an EMPTY/NULL array is harmless and stays allowed
    ok = spark.createDataFrame([(None, []), (None, None), (2, ["comeu"])],
                               "i long, a array<string>")
    got = {r["i"]: r["o"] for r in distinct_element_transform(
        ok, "a", fn, "i", "o").collect()}
    assert got[None] == [] and got[2] == ["com"]


def test_distinct_element_transform_duplicate_id_raises(spark):
    """Duplicate ids merge arrays across rows in the regroup — the
    size mismatch between input and output fails loudly."""
    import pytest
    from transmogrifai_spark.util import distinct_element_transform
    fn = lambda t: snowball_stem(t, "pt")
    df = spark.createDataFrame([(1, ["casas"]), (1, ["gatos", "comeu"])],
                               "i long, a array<string>")
    with pytest.raises(Exception, match="duplicate values in id_col"):
        distinct_element_transform(df, "a", fn, "i", "o").collect()
