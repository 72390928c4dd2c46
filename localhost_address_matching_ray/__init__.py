"""localhost_address_matching_ray — a Ray-Data-native record-linkage engine.

A from-scratch, Ray-Data-first re-expression of the capabilities of the
reference repo ``yegeb/localhost-address-matching`` (Turkish address
normalize → parse → match; see SURVEY.md for the full structural analysis),
generalized to source-code repository deduplication over a Parquet corpus
``(repo, path, commit, lang, content)``.

Pipeline shape (SURVEY.md §7.0)::

    read_parquet(corpus)
      → normalize           (stateless map_batches: path canonicalization,
                             content whitespace-fold, content_sha256)
      → features            (actor-pool map_batches: tokens, shingles, MinHash)
      → block               (composite keys lang ⊕ band ⊕ stem, salted hot keys)
      → groupby(block_key).map_groups(pair + score)
      → edges → union-find  (iterated groupby min-label propagation)
      → clusters → write_parquet  (+ manifest-validated checkpoints & metrics)

Nothing here calls ``ray.init()``/``ray.shutdown()`` — sessions are owned by
the caller (driver, bench.py, or the pytest fixture).
"""

from localhost_address_matching_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
