"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``localhost_address_matching_ray.pipelines.queries`` (the
registry pairs each Ray pipeline with its DuckDB oracle so the two can never
drift apart). Nothing here calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship record-linkage pipeline on /root/testdata/sf0.001: derive the
    corpus from ``documents``, then normalize → exact-dedup → MinHash
    features → salted blocking → pair scoring → union-find clusters."""
    import ray.data

    from localhost_address_matching_ray.config import PipelineConfig
    from localhost_address_matching_ray.pipelines.linkage import link_corpus
    from localhost_address_matching_ray.sources.tables import corpus_from_documents

    corpus = corpus_from_documents("/root/testdata/sf0.001")
    result = link_corpus(corpus, PipelineConfig(feature_concurrency=2))
    return result["clusters"]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from localhost_address_matching_ray.pipelines.queries import REGISTRY

    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; non-expressible
    ops (LSH/SimHash candidates, rolling hashes, the stubbed multimodal
    stage, the fixture flagship) are omitted → rows-only checks."""
    from localhost_address_matching_ray.pipelines.queries import REGISTRY

    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
