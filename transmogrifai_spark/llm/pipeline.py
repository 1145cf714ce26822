"""One-call corpus curation: the standard LLM data-prep recipe composed
from the engine's operators, each stage optional.

Order follows practice (C4/Gopher -> decontaminate -> dedup -> LM head ->
mixture), cheapest-reduction-first so later, costlier stages see fewer rows:

  0. web extraction  (`web.remove_boilerplate` when `html_col=` is given:
     HTML payloads -> boilerplate-free text, empty extractions dropped);
     URL-level dedup when `url_col=` is given (one doc per canonical URL,
     min-id survivor — the cheap pass before any content dedup)
  1. quality rules   (`quality_rules.quality_filter`, expression-only)
     + optional word blocklist (`blocklist_filter`) and corpus-level
     boilerplate-paragraph removal (`dedup.remove_common_paragraphs`)
  2. decontamination (`decontam.decontaminate`, eval set broadcast)
  3. deduplication   (exact digest keep-min-id, or MinHash-LSH clusters
                      with one representative per cluster)
  4. LM perplexity head (`lm_score.perplexity_filter`, model pre-fitted on
                      a clean reference corpus)
  5. supervised quality head (`quality_classifier`, pre-trained on seed
                      sets) with GPT-3-style Pareto resampling
  6. semantic dedup  (`dedup.semantic_dedup`, when an embedding column is
                      available — SemDeDup within-cluster cosine)
  7. mixture / budget sampling (`curation.mix_corpora` /
                      `token_budget_sample`)

Every stage is a narrow DataFrame -> DataFrame transform: the whole recipe
stays one lazy plan; nothing is counted or collected unless the caller asks
for the per-stage report (which costs one count per enabled stage).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import mix_corpora
from .decontam import decontaminate
from .dedup import duplicate_clusters, exact_dedup, minhash_lsh_candidates
from .lm_score import perplexity_filter
from .quality_rules import quality_filter

__all__ = ["dedup_keep_one", "curate_corpus"]


def dedup_keep_one(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", method: str = "exact",
                   bands: int = 8, num_hashes: int = 32) -> DataFrame:
    """Drop duplicates, keeping one representative per duplicate group.

    * ``exact``   — min-id per content digest (one hash-groupBy).
    * ``minhash`` — MinHash-LSH candidate pairs -> connected components ->
      keep the cluster representative (min id). Near-duplicates collapse
      together with their exact copies (identical docs share every band, so
      exact dupes are always candidates).
    """
    if method == "exact":
        keep = exact_dedup(df, id_col, text_col) \
            .select(F.col("representative").alias(id_col))
        return df.join(keep, id_col, "left_semi")
    if method == "minhash":
        pairs = minhash_lsh_candidates(df, id_col, text_col,
                                       num_hashes=num_hashes, bands=bands)
        clusters = duplicate_clusters(pairs)  # doc, cluster_id(=min id)
        drop = clusters.where(F.col("doc") != F.col("cluster_id")) \
            .select(F.col("doc").alias(id_col))
        return df.join(drop, id_col, "left_anti")
    raise ValueError(f"unknown dedup method {method!r}")


def curate_corpus(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", *,
                  html_col: str | None = None,
                  max_link_density: float = 0.5, min_block_chars: int = 10,
                  url_col: str | None = None,
                  rules: str | None = "gopher",
                  blocklist: list[str] | None = None,
                  boilerplate_min_doc_freq: int | None = None,
                  eval_df: DataFrame | None = None, decontam_n: int = 13,
                  dedup: str | None = "exact",
                  lm_model: dict | None = None,
                  max_perplexity: float = 50.0,
                  quality_model=None, pareto_alpha: float | None = None,
                  min_quality_prob: float = 0.5,
                  embedding_col: str | None = None,
                  semantic_eps: float = 0.95, semantic_clusters: int = 16,
                  mixture: dict[str, float] | None = None,
                  group_col: str = "lang",
                  report: bool = False):
    """Run the curation recipe; returns the curated DataFrame, or
    ``(DataFrame, {stage: rows_remaining})`` when ``report=True``."""
    stages: list[tuple[str, DataFrame]] = [("input", docs)]
    out = docs
    if html_col:
        # stage 0: web extraction — HTML payloads become text_col via
        # llm/web.remove_boilerplate (jusText-lite); docs whose extraction
        # comes out empty are dropped. Pure expressions, so this fuses
        # into the same scan as the quality rules below.
        from .web import remove_boilerplate
        cleaned = remove_boilerplate(F.col(html_col),
                                     max_link_density=max_link_density,
                                     min_chars=min_block_chars)
        out = (out.withColumn(text_col, cleaned["text"])
               .where(F.length(F.col(text_col)) > 0).drop(html_col))
        stages.append(("web_extract", out))
    if url_col:
        # stage 0.5: URL-level dedup — the standard pre-content-dedup pass
        # for web corpora: one document per CANONICAL url (tracking params,
        # default ports, fragment and param order collapse), min-id
        # survivor. One hash-groupBy over (canon_url) — far cheaper than
        # content dedup, run first so content stages see fewer rows.
        from .web import canonicalize_url
        canon = out.select(id_col,
                           canonicalize_url(F.col(url_col)).alias("_canon"))
        # rows with NO canonical url (missing WARC target_uri, unparseable
        # scheme) pass through untouched — grouping them would collapse
        # every null-URL document into one survivor (advisory finding).
        # Survivor ids (min id per canonical url) union the null-url ids,
        # then ONE left-semi join; the multi-regex canonicalization is
        # evaluated only on the pruned (id, url) projection, never re-
        # derived on the full-width frame (r7 review finding).
        keep = (canon.where(F.col("_canon").isNotNull())
                .groupBy("_canon")
                .agg(F.min(id_col).alias(id_col)).select(id_col)
                .unionByName(canon.where(F.col("_canon").isNull())
                             .select(id_col)))
        out = out.join(keep, id_col, "left_semi")
        stages.append(("url_dedup", out))
    if rules:
        kept = quality_filter(out, id_col, text_col, rules=rules) \
            .where("keep").select(id_col)
        out = out.join(kept, id_col, "left_semi")
        stages.append(("quality_rules", out))
    if blocklist:
        from .quality_rules import blocklist_filter
        out = blocklist_filter(out, text_col, blocklist,
                               large=len(blocklist) > 200, id_col=id_col)
        stages.append(("blocklist", out))
    if boilerplate_min_doc_freq:
        from .dedup import remove_common_paragraphs
        out = remove_common_paragraphs(out, id_col, text_col,
                                       min_doc_freq=boilerplate_min_doc_freq)
        stages.append(("boilerplate_paragraphs", out))
    if eval_df is not None:
        out = decontaminate(out, eval_df, id_col, text_col, n=decontam_n)
        stages.append(("decontaminated", out))
    if dedup:
        out = dedup_keep_one(out, id_col, text_col, method=dedup)
        stages.append(("deduplicated", out))
    if lm_model is not None:
        out = perplexity_filter(out, lm_model, text_col,
                                max_perplexity=max_perplexity)
        stages.append(("lm_head", out))
    if quality_model is not None:
        # supervised head (quality_classifier.train_quality_classifier):
        # Pareto resampling when alpha is given (the GPT-3 rule — smooth,
        # quality-biased), hard threshold otherwise
        from .quality_classifier import pareto_quality_sample
        scored = quality_model.score(out, text_col)
        if pareto_alpha is not None:
            out = pareto_quality_sample(scored, id_col, "quality_prob",
                                        alpha=pareto_alpha) \
                .drop("quality_prob")
        else:
            out = scored.where(F.col("quality_prob") >= min_quality_prob) \
                .drop("quality_prob")
        stages.append(("quality_classifier", out))
    if embedding_col:
        from .dedup import semantic_dedup
        out = semantic_dedup(out, id_col, embedding_col,
                             n_clusters=semantic_clusters, eps=semantic_eps)
        stages.append(("semantic_dedup", out))
    if mixture:
        out = mix_corpora(out, id_col, group_col, mixture)
        stages.append(("mixture", out))
    if report:
        return out, {name: df.count() for name, df in stages}
    return out
