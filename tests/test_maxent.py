"""OpenNLP GIS maxent models (operators/maxent.py): public plain-text
format round-trip + expression scoring laws + the NER dispatch.

Reference: core/src/main/scala/com/salesforce/op/stages/impl/feature/
NameEntityRecognizer.scala:56 — scores with pre-trained OpenNLP maxent
models; this module loads the user's copy of that public model format
and scores it as expressions.
"""
import math

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.operators.maxent import (load_opennlp_gis_model,
                                                  maxent_best_outcome,
                                                  maxent_probs,
                                                  maxent_sums,
                                                  save_opennlp_gis_model)


def _model():
    # two outcome patterns: PERSON/LOC predicates see all three
    # outcomes, the ORG-only suffix predicate sees a strict subset —
    # exercises the pattern-table compression both ways
    return {
        "outcomes": ["PERSON", "LOCATION", "ORGANIZATION"],
        "weights": {
            "w=alice": {"PERSON": 2.5, "LOCATION": -0.5,
                        "ORGANIZATION": -1.0},
            "w=paris": {"PERSON": -0.25, "LOCATION": 3.0,
                        "ORGANIZATION": -0.75},
            "shape=title": {"PERSON": 0.5, "LOCATION": 0.5,
                            "ORGANIZATION": 0.25},
            "suf3=inc": {"ORGANIZATION": 4.0},
            "suf3=llc": {"ORGANIZATION": 3.5},
        },
        "correction_constant": 3,
        "correction_param": 0.125,
    }


def _mirror_probs(bag, model):
    """The published GISModel.eval arithmetic, feature values = 1."""
    outcomes = model["outcomes"]
    sums = {o: 0.0 for o in outcomes}
    for f in bag:
        per = model["weights"].get(f)
        if per:
            for o, w in per.items():
                sums[o] += w
    c = float(model["correction_constant"])
    cp = float(model["correction_param"])
    ex = [math.exp(sums[o] / c + cp) for o in outcomes]
    z = 0.0
    for v in ex:
        z += v
    return {o: v / z for o, v in zip(outcomes, ex)}


@pytest.fixture(scope="module")
def gis(tmp_path_factory):
    p = tmp_path_factory.mktemp("gis") / "ner.gis.txt"
    save_opennlp_gis_model(_model(), str(p))
    return load_opennlp_gis_model(str(p)), str(p)


def test_round_trip(gis):
    loaded, path = gis
    m = _model()
    assert loaded["type"] == "GIS"
    assert loaded["outcomes"] == m["outcomes"]
    assert loaded["labels"] == m["outcomes"]
    assert loaded["correction_constant"] == 3
    assert loaded["correction_param"] == 0.125
    # sparse weights identical, pattern grouping included (suf3=* carry
    # ONLY the ORGANIZATION key)
    assert loaded["weights"] == m["weights"]
    # the file really is the public layout: header + int + double lines
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    assert lines[0] == "GIS"
    assert lines[1] == "3"
    assert float(lines[2]) == 0.125
    assert lines[3] == "3" and lines[4:7] == m["outcomes"]
    # two distinct outcome patterns were written
    assert int(lines[7]) == 2


def test_loader_errors(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("MAXENT_QN\n1\n0.0\n")
    with pytest.raises(ValueError, match="expected 'GIS'"):
        load_opennlp_gis_model(str(bad))
    trunc = tmp_path / "trunc.txt"
    trunc.write_text("GIS\n1\n0.0\n2\nA\n")
    with pytest.raises(ValueError, match="truncated"):
        load_opennlp_gis_model(str(trunc))


def test_expression_scoring_matches_mirror(spark, gis):
    """THE law: expression probabilities == the pure-Python GIS eval,
    unknown predicates and subset-pattern predicates included."""
    loaded, _ = gis
    bags = [["w=alice", "shape=title"],
            ["w=paris", "shape=title", "w=unknown"],
            ["suf3=inc", "shape=title"],
            ["suf3=llc"],
            ["w=nothing", "also=nothing"]]
    df = spark.createDataFrame([(b,) for b in bags], "bag array<string>")
    got = df.select(maxent_probs(F.col("bag"), loaded).alias("p"),
                    maxent_sums(F.col("bag"), loaded).alias("s")).collect()
    for bag, row in zip(bags, got):
        want = _mirror_probs(bag, loaded)
        assert set(row["p"]) == set(want)
        for o in want:
            assert row["p"][o] == pytest.approx(want[o], rel=1e-12, abs=0)
        assert sum(row["p"].values()) == pytest.approx(1.0, rel=1e-12)
        # raw sums: unknown predicates contributed exactly 0
        for o in loaded["outcomes"]:
            base = sum(loaded["weights"].get(f, {}).get(o, 0.0)
                       for f in bag)
            assert row["s"][o] == pytest.approx(base, rel=1e-12, abs=1e-15)


def test_best_outcome_tie_rule(spark):
    """OpenNLP's getBestOutcome: FIRST max in OUTCOME order — pin it
    with an exact tie (the NB family breaks ties alphabetically, so
    outcome order B-before-A is the discriminating fixture)."""
    model = {"type": "GIS", "outcomes": ["ZULU", "ALPHA"],
             "labels": ["ZULU", "ALPHA"],
             "weights": {"f": {"ZULU": 1.0, "ALPHA": 1.0},
                         "g": {"ALPHA": 2.0}},
             "correction_constant": 1, "correction_param": 0.0}
    df = spark.createDataFrame([(["f"],), (["f", "g"],), ([],), (None,)],
                               "bag array<string>")
    got = [r["b"] for r in
           df.select(maxent_best_outcome(F.col("bag"), model).alias("b"))
           .collect()]
    # exact tie -> ZULU (first in outcome order, NOT alphabetical);
    # empty and NULL bags abstain
    assert got == ["ZULU", "ALPHA", None, None]


def test_ner_dispatch_via_type_marker(spark, gis):
    """typed_entities_statistical routes type='GIS' models through the
    maxent scorer: chunk_features-named predicates classify fixture
    sentences into the typed-entity map."""
    from transmogrifai_spark.operators.ner_nb import (
        chunk_features, typed_entities_statistical)
    # weights over the REAL chunk_features vocabulary: inspect the
    # features the chunker emits, then weight them
    probe = spark.range(1).select(
        chunk_features(F.lit("Acme Inc")).alias("f"),
        chunk_features(F.lit("Alice")).alias("g")).head()
    assert "suf3=inc" in probe["f"] and "first=alice" in probe["g"]
    model = {
        "type": "GIS",
        "outcomes": ["PERSON", "LOCATION", "ORGANIZATION"],
        "labels": ["PERSON", "LOCATION", "ORGANIZATION"],
        "weights": {
            "first=alice": {"PERSON": 2.5, "LOCATION": -0.5,
                            "ORGANIZATION": -1.0},
            "first=paris": {"PERSON": -0.25, "LOCATION": 3.0,
                            "ORGANIZATION": -0.75},
            "suf3=inc": {"ORGANIZATION": 4.0},
        },
        "correction_constant": 3, "correction_param": 0.0,
        "context": False,
    }
    df = spark.createDataFrame(
        [("Alice visited Acme Inc in May",)], "text string")
    got = df.select(typed_entities_statistical(
        F.col("text"), model).alias("e")).head()["e"]
    assert "Alice" in got["PERSON"]
    assert "Acme Inc" in got["ORGANIZATION"]


# -- r10: token-level beam decoding (NameFinderME semantics) --

def _beam_fixture_model():
    import random
    rng = random.Random(7)
    out = ["other", "per-start", "per-cont"]
    pool = ["Alice", "Bob", "ran", "to", "Paris", "in", "May", "2020",
            "smith", "Dr"]
    feats = {"wc=ic", "wc=lc", "wc=num", "wc=other", "pw=*BOS*",
             "nw=*EOS*"}
    for t in pool:
        feats |= {f"w={t}", f"wl={t.lower()}", f"pw={t}", f"nw={t}"}
    weights = {f: {o: round(rng.uniform(-2, 2), 3) for o in out}
               for f in sorted(feats)}
    for p in out:
        weights[f"pd={p}"] = {o: round(rng.uniform(-2, 2), 3)
                              for o in out}
    model = {"type": "GIS", "outcomes": out, "labels": out,
             "weights": weights, "correction_constant": 3,
             "correction_param": 0.0, "context": False}
    seqs = [[rng.choice(pool) for _ in range(rng.randint(0, 7))]
            for _ in range(40)]
    return model, seqs


def test_beam_tag_expression_equals_python_mirror(spark):
    """THE law: the aggregate-over-positions beam expression decodes
    every sequence exactly like the Python beam mirror, at width 3 and
    width 1 (greedy), with and without the sequence validator."""
    from transmogrifai_spark.operators.maxent import (maxent_beam_tag,
                                                      maxent_beam_tag_py)
    model, seqs = _beam_fixture_model()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)] + [(999, None)],
        "i long, toks array<string>")
    for kw in ({}, {"beam": 1}, {"validate": False}):
        got = {r["i"]: (list(r["o"]) if r["o"] is not None else None)
               for r in df.select(
                   "i", maxent_beam_tag(F.col("toks"), model,
                                        **kw).alias("o")).collect()}
        want = {i: maxent_beam_tag_py(s, model, **kw)
                for i, s in enumerate(seqs)}
        assert {i: got[i] for i in want} == want
        assert got[999] == []        # NULL input -> empty tag array


def test_beam_validator_blocks_cont_without_start():
    """NameFinderSequenceValidator: '<type>-cont' only after
    '<type>-start'/'<type>-cont' — never sequence-initial, never after
    'other' (checked over every decoded sequence)."""
    from transmogrifai_spark.operators.maxent import maxent_beam_tag_py
    model, seqs = _beam_fixture_model()
    for s in seqs:
        prev = None
        for o in maxent_beam_tag_py(s, model):
            if o == "per-cont":
                assert prev in ("per-start", "per-cont"), (s, o)
            prev = o


def test_beam_width_3_dominates_greedy():
    """The decoding-depth law: the width-3 beam's final accumulated
    log-prob is >= the greedy (width-1) path's on every sequence, and
    strictly better on some (the prev-outcome coupling makes locally
    best choices globally suboptimal — the reason NameFinderME beams)."""
    import math

    from transmogrifai_spark.operators.maxent import (_beam_model_parts,
                                                      beam_token_features,
                                                      maxent_beam_tag_py)
    model, seqs = _beam_fixture_model()
    outcomes, c, pd, (cont_ok, bos_ok) = _beam_model_parts(model)
    idx = {o: i for i, o in enumerate(outcomes)}
    dense = {p: [per.get(o, 0.0) for o in outcomes]
             for p, per in model["weights"].items()}

    def path_score(toks, labs):
        total, prev = 0.0, None
        for i, (t, lab) in enumerate(zip(toks, labs)):
            feats = beam_token_features(
                t, toks[i - 1] if i > 0 else None,
                toks[i + 1] if i + 1 < len(toks) else None)
            base = [0.0] * len(outcomes)
            for f in feats:
                w = dense.get(f)
                if w:
                    base = [a + b for a, b in zip(base, w)]
            row = pd[prev] if prev is not None else [0.0] * len(outcomes)
            s = [a + b for a, b in zip(base, row)]
            lz = math.log(sum(math.exp(x / c) for x in s))
            total += round(s[idx[lab]] / c - lz, 9)
            prev = idx[lab]
        return total

    better = 0
    for s in seqs:
        if not s:
            continue
        b3 = path_score(s, maxent_beam_tag_py(s, model, beam=3))
        b1 = path_score(s, maxent_beam_tag_py(s, model, beam=1))
        assert b3 >= b1 - 1e-9, s
        if b3 > b1 + 1e-9:
            better += 1
    assert better > 0


def test_binary_gis_round_trip(tmp_path):
    """The BINARY GIS serialization (BinaryGISModelWriter: the same
    GISModelWriter.persist token sequence, Java DataOutputStream
    encodings) round-trips and matches the plain-text load — including
    modified-UTF-8 edges (NUL -> C0 80, supplementary chars as CESU-8
    surrogate pairs)."""
    from transmogrifai_spark.operators.maxent import (
        load_opennlp_gis_model_bin, save_opennlp_gis_model_bin)
    m = _model()
    m["weights"]["w=jörg\U0001d11e\x00"] = {"PERSON": 0.5}
    tp, bp = tmp_path / "m.txt", tmp_path / "m.gis"
    save_opennlp_gis_model(m, str(tp))
    save_opennlp_gis_model_bin(m, str(bp))
    t = load_opennlp_gis_model(str(tp))
    b = load_opennlp_gis_model_bin(str(bp))
    assert b["outcomes"] == t["outcomes"] == m["outcomes"]
    assert b["correction_constant"] == 3
    assert b["correction_param"] == 0.125
    assert b["weights"] == t["weights"]
    # binary header magic is the writeUTF('GIS') prefix
    assert open(bp, "rb").read(5) == b"\x00\x03GIS"


def test_binary_gis_truncation_and_header_errors(tmp_path):
    from transmogrifai_spark.operators.maxent import (
        load_opennlp_gis_model_bin, save_opennlp_gis_model_bin)
    bp = tmp_path / "m.gis"
    save_opennlp_gis_model_bin(_model(), str(bp))
    data = open(bp, "rb").read()
    with pytest.raises(ValueError, match="truncated"):
        load_opennlp_gis_model_bin(data[:-4])
    with pytest.raises(ValueError, match="not a GIS model"):
        load_opennlp_gis_model_bin(b"\x00\x03QNM" + data[5:])


def test_opennlp_zip_archive_load(tmp_path):
    """Model ARCHIVE (.bin zip: manifest.properties + serialized model
    entries): the GIS entry is found by CONTENT magic, the manifest
    parses with java-Properties escapes, and a GIS-free archive raises
    a clean error."""
    import zipfile

    from transmogrifai_spark.operators.maxent import (
        load_opennlp_model_zip, save_opennlp_gis_model_bin)
    bp = tmp_path / "inner.gis"
    save_opennlp_gis_model_bin(_model(), str(bp))
    zp = tmp_path / "ner-model.bin"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("manifest.properties",
                    "#c\nManifest-Version=1.0\n"
                    "Component-Name: TokenNameFinder\nLanguage=en\n"
                    "key\\:esc=va\\nlue\\u0041\n")
        zf.writestr("nameFinder.model", open(bp, "rb").read())
    z = load_opennlp_model_zip(str(zp))
    assert z["weights"] == _mk_loaded_weights()
    assert z["manifest"]["Language"] == "en"
    assert z["manifest"]["Component-Name"] == "TokenNameFinder"
    assert z["manifest"]["key:esc"] == "va\nlueA"
    zp2 = tmp_path / "perc-model.bin"
    with zipfile.ZipFile(zp2, "w") as zf:
        zf.writestr("manifest.properties", "a=b\n")
        zf.writestr("x.model", b"\x00\x0aPerceptron")
    with pytest.raises(ValueError, match="no binary GIS model entry"):
        load_opennlp_model_zip(str(zp2))


def test_java_properties_backslash_parity_and_surrogate_decode():
    """Two r11-ADVICE edges: (1) java.util.Properties counts
    TRAILING-BACKSLASH PARITY for line continuations — a line ending
    in an odd run (escaped backslash + real continuation, '...\\\\\\')
    continues, an even run does not; (2) modified-UTF-8 data with an
    unpaired UTF-16 surrogate raises at decode time instead of
    producing a str that explodes on a later .encode()."""
    from transmogrifai_spark.operators.maxent import (
        _java_modified_utf8_decode, load_java_properties)
    # odd run of 3: '\\' (escaped backslash) + '\' (continuation)
    p = load_java_properties("a=x\\\\\\\ny\nb=z\\\\\nc=w\n")
    assert p["a"] == "x\\y"      # continued onto 'y'
    assert p["b"] == "z\\"       # even run: NOT continued
    assert p["c"] == "w"
    # unpaired high surrogate (CESU-8 high half with no low half)
    import pytest as _pt
    with _pt.raises(ValueError, match="unpaired UTF-16 surrogate"):
        _java_modified_utf8_decode(b"\xed\xa0\x80ab")
    # a proper CESU-8 pair still decodes
    assert _java_modified_utf8_decode(
        b"\xed\xa0\xb4\xed\xb4\x9e") == "\U0001d11e"


def _mk_loaded_weights():
    m = _model()
    return {p: {o: float(w) for o, w in per.items()}
            for p, per in m["weights"].items()}


def test_zip_loaded_model_scores_like_text_loaded(spark, gis, tmp_path):
    """A model that traveled zip->binary scores bit-identically to the
    plain-text-loaded copy through the expression scorer."""
    import zipfile

    from transmogrifai_spark.operators.maxent import (
        load_opennlp_model_zip, save_opennlp_gis_model_bin)
    model, _ = gis
    bp = tmp_path / "m.gis"
    save_opennlp_gis_model_bin(model, str(bp))
    zp = tmp_path / "m-model.bin"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("manifest.properties", "Language=en\n")
        zf.writestr("m.model", open(bp, "rb").read())
    z = load_opennlp_model_zip(str(zp))
    bags = [["w=alice", "shape=title"], ["suf3=inc"], ["w=paris"]]
    df = spark.createDataFrame([(b,) for b in bags],
                               "bag array<string>")
    a = df.select(maxent_best_outcome(F.col("bag"), model)
                  .alias("o")).collect()
    b = df.select(maxent_best_outcome(F.col("bag"), z)
                  .alias("o")).collect()
    assert [r["o"] for r in a] == [r["o"] for r in b]


def _beam_fix_model():
    return {"type": "GIS",
            "outcomes": ["other", "person-start", "person-cont",
                         "location-start"],
            "labels": ["other", "person-start", "person-cont",
                       "location-start"],
            "weights": {"wl=alice": {"person-start": 2.0},
                        "wl=smith": {"person-cont": 1.8},
                        "wl=paris": {"location-start": 2.2},
                        "wl=went": {"other": 2.0},
                        "wl=to": {"other": 2.0},
                        "pd=person-start": {"person-cont": 1.0}},
            "correction_constant": 1, "correction_param": 0.0,
            "context": False}


def test_beam_spans_expression_equals_mirror(spark):
    """Span extraction (the NameFinderME.find() Span[] shape) over the
    beam tags: expression == python mirror on sequences exercising
    open/extend/close, back-to-back mentions, a trailing live span,
    and empty input."""
    from transmogrifai_spark.operators.maxent import (
        maxent_beam_spans, maxent_beam_spans_py)
    m = _beam_fix_model()
    seqs = [["Alice", "Smith", "went", "to", "Paris"],
            ["Alice", "Smith", "Alice", "Smith"],   # back-to-back
            ["went", "to"],
            ["Alice", "Smith"],                      # trailing live span
            ["Paris"],
            []]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)],
                               "i long, toks array<string>")
    got = {r["i"]: [x.asDict() for x in r["s"]] for r in df.select(
        "i", maxent_beam_spans(F.col("toks"), m).alias("s")).collect()}
    for i, s in enumerate(seqs):
        assert got[i] == maxent_beam_spans_py(s, m), (i, s, got[i])
    # pinned shape: person span [0,2) + location span [4,5)
    assert got[0] == [
        {"type": "person", "start": 0, "end": 2, "text": "Alice Smith"},
        {"type": "location", "start": 4, "end": 5, "text": "Paris"}]
    assert got[3] == [
        {"type": "person", "start": 0, "end": 2, "text": "Alice Smith"}]


def test_beam_spans_cont_without_start_ignored(spark):
    """A -cont emitted with no live span (possible with
    validate=False) is IGNORED — BioCodec.decode leaves start at -1
    and emits no span (r12: fixed to match OpenNLP; r11 opened a
    mention here, a divergence the r11 ADVICE flagged)."""
    from transmogrifai_spark.operators.maxent import (
        maxent_beam_spans, maxent_beam_spans_py)
    m = _beam_fix_model()
    toks = ["Smith", "went"]   # wl=smith only scores person-cont
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    got = [x.asDict() for x in df.select(
        maxent_beam_spans(F.col("toks"), m, validate=False)
        .alias("s")).first()["s"]]
    assert got == maxent_beam_spans_py(toks, m, validate=False)
    assert got == []


def test_beam_spans_mismatched_cont_extends(spark):
    """A -cont whose type differs from the live span EXTENDS it
    (BioCodec tracks positions only), and the closed span takes the
    type of its LAST member tag (extractNameType(tags[li-1])) — so a
    person-start + location-cont mention closes as 'location'."""
    from transmogrifai_spark.operators.maxent import (
        maxent_beam_spans, maxent_beam_spans_py)
    m = {"type": "GIS",
         "outcomes": ["other", "person-start", "location-cont"],
         "labels": ["other", "person-start", "location-cont"],
         "weights": {"wl=alice": {"person-start": 4.0},
                     "wl=paris": {"location-cont": 4.0},
                     "wl=went": {"other": 4.0}},
         "correction_constant": 1, "correction_param": 0.0,
         "context": False}
    toks = ["Alice", "Paris", "went"]
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    got = [x.asDict() for x in df.select(
        maxent_beam_spans(F.col("toks"), m, validate=False)
        .alias("s")).first()["s"]]
    assert got == maxent_beam_spans_py(toks, m, validate=False)
    assert got == [{"type": "location", "start": 0, "end": 2,
                    "text": "Alice Paris"}]


def test_ner_find_end_to_end(spark, tmp_path):
    """Document-level TokenNameFinder over a zip-packaged model: text
    -> case-preserving tokens -> beam -> typed spans."""
    import zipfile

    from transmogrifai_spark.operators.maxent import (
        load_opennlp_model_zip, ner_find, save_opennlp_gis_model_bin)
    bp = tmp_path / "m.gis"
    save_opennlp_gis_model_bin(_beam_fix_model(), str(bp))
    zp = tmp_path / "person-model.bin"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("manifest.properties", "Language=en\n")
        zf.writestr("m.model", open(bp, "rb").read())
    model = load_opennlp_model_zip(str(zp))
    df = spark.createDataFrame(
        [(1, "Alice Smith went to Paris"), (2, "went to"), (3, None)],
        "i long, t string")
    got = {r["i"]: [x.asDict() for x in r["entities"]] for r in
           ner_find(df, "t", model).select("i", "entities").collect()}
    assert got[1] == [
        {"type": "person", "start": 0, "end": 2, "text": "Alice Smith"},
        {"type": "location", "start": 4, "end": 5, "text": "Paris"}]
    assert got[2] == [] and got[3] == []


def test_featuregen_xml_parse_and_reject():
    """The descriptor parser accepts the documented stateless subset
    (cache/window/token/tokenclass/bigram/definition) and REJECTS
    anything else with a clean error naming the element — the r11
    'parse-the-subset-reject-the-rest' prescription: adaptive or
    resource-backed generators must never silently mis-score."""
    from transmogrifai_spark.operators.maxent import load_featuregen_xml
    spec = load_featuregen_xml(
        "<generators><cache><generators>"
        '<window prevLength="2" nextLength="2"><token/></window>'
        '<window prevLength="1" nextLength="1">'
        '<tokenclass wordAndClass="false"/></window>'
        "<bigram/><definition/>"
        "</generators></cache></generators>")
    assert spec == [
        {"gen": "token", "prev": 2, "next": 2},
        {"gen": "tokenclass", "prev": 1, "next": 1, "wac": False},
        {"gen": "bigram"}, {"gen": "definition"}]
    for bad in ("<generators><prevmap/></generators>",
                "<generators><sentence/></generators>",
                "<generators><charngram min='2' max='5'/></generators>",
                "<generators><dictionary dict='x'/></generators>"):
        with pytest.raises(ValueError, match="unsupported feature "
                                             "generator element"):
            load_featuregen_xml(bad)
    with pytest.raises(ValueError, match="exactly one"):
        load_featuregen_xml(
            "<generators><window><token/><bigram/></window></generators>")
    with pytest.raises(ValueError, match="no feature generators"):
        load_featuregen_xml("<generators><cache/></generators>")
    with pytest.raises(ValueError, match="malformed"):
        load_featuregen_xml("<generators><token></generators>")


def test_featuregen_expression_equals_mirror(spark):
    """Backend law: descriptor-driven features and beam decoding are
    identical between the Catalyst expressions and the python mirror
    (window edges, bigram edges, w&c, def)."""
    from transmogrifai_spark.operators.maxent import (
        featuregen_token_features, load_featuregen_xml,
        maxent_beam_decode, maxent_beam_decode_py)
    spec = load_featuregen_xml(
        "<generators>"
        '<window prevLength="2" nextLength="2"><token/></window>'
        '<window prevLength="1" nextLength="1"><tokenclass/></window>'
        "<bigram/><definition/></generators>")
    seqs = [["Alice", "went", "to", "Paris"], ["42"], ["a", "B"], []]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)],
                               "i long, toks array<string>")
    # feature law at every position
    got = {r["i"]: r["fs"] for r in df.select("i", F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("toks"), F.lit(1))),
        lambda p: F.when(p <= F.size("toks"), featuregen_token_features(
            spec, F.col("toks"), p))).alias("fs")).collect()}
    for i, s in enumerate(seqs):
        want = [featuregen_token_features(spec, s, j)
                for j in range(len(s))] or [None]
        assert got[i] == want, (i, s)
    # decode law end-to-end
    m = {"type": "GIS", "outcomes": ["other", "ent-start", "ent-cont"],
         "labels": ["other", "ent-start", "ent-cont"],
         "weights": {"wc=ic": {"ent-start": 1.4},
                     "p1w=alice": {"ent-cont": 0.9},
                     "w,nw=went,to": {"other": 1.1},
                     "pwc,wc=ic,lc": {"other": 0.7},
                     "def": {"other": 0.2},
                     "pd=ent-start": {"ent-cont": 0.8}},
         "correction_constant": 2, "correction_param": 0.0,
         "context": False}
    out = {r["i"]: r["d"] for r in df.select("i", maxent_beam_decode(
        F.col("toks"), m, featuregen=spec).alias("d")).collect()}
    for i, s in enumerate(seqs):
        tags, sc = maxent_beam_decode_py(s, m, featuregen=spec)
        assert list(out[i]["tags"]) == tags and out[i]["sc"] == sc, (i, s)


def test_featuregen_equals_fixed_set_on_renamed_model(spark):
    """THE closing law for PARITY delta 3: a descriptor of
    window(token,1,1) + tokenclass carries exactly the information of
    the documented fixed set minus its BOS/EOS markers and cased w=,
    so a model whose weights live on wl=/wc=/pw=/nw= (no marker or
    cased-w predicates) scores BIT-IDENTICALLY under the
    descriptor-driven path with the correspondingly renamed
    predicates (wl=x -> w=x, pw=X -> p1w=x, nw=X -> n1w=x)."""
    from transmogrifai_spark.operators.maxent import (
        load_featuregen_xml, maxent_beam_decode)
    fixed_w = {"wl=alice": {"person-start": 2.0},
               "wl=smith": {"person-cont": 2.0},
               "wc=ic": {"person-start": 0.6},
               "pw=Alice": {"person-cont": 1.1},
               "nw=Smith": {"person-start": 0.5},
               "wl=went": {"other": 2.5},
               "pd=person-start": {"person-cont": 0.7}}
    ren = {}
    for k, v in fixed_w.items():
        if k.startswith("wl="):
            ren["w=" + k[3:]] = v
        elif k.startswith("pw="):
            ren["p1w=" + k[3:].lower()] = v
        elif k.startswith("nw="):
            ren["n1w=" + k[3:].lower()] = v
        else:
            ren[k] = v
    base = {"type": "GIS", "correction_constant": 2,
            "correction_param": 0.0, "context": False,
            "outcomes": ["other", "person-start", "person-cont"],
            "labels": ["other", "person-start", "person-cont"]}
    m_fixed = dict(base, weights=fixed_w)
    m_desc = dict(base, weights=ren)
    spec = load_featuregen_xml(
        "<generators>"
        '<window prevLength="1" nextLength="1"><token/></window>'
        '<tokenclass wordAndClass="false"/>'
        "</generators>")
    seqs = [["Alice", "Smith", "went"], ["Alice"], ["went", "Alice",
            "Smith"], []]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)],
                               "i long, toks array<string>")
    fx = {r["i"]: r["d"] for r in df.select("i", maxent_beam_decode(
        F.col("toks"), m_fixed).alias("d")).collect()}
    ds = {r["i"]: r["d"] for r in df.select("i", maxent_beam_decode(
        F.col("toks"), m_desc, featuregen=spec).alias("d")).collect()}
    for i in range(len(seqs)):
        assert list(fx[i]["tags"]) == list(ds[i]["tags"]), i
        assert fx[i]["sc"] == ds[i]["sc"], i
    assert list(fx[0]["tags"]) == ["person-start", "person-cont",
                                   "other"]
