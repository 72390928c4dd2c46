"""Feature stage — the stateful actor-pool tagger.

Reference analog: the NER inference stage (``ner_address_parser.py``) —
"load the model once, then stream batches" (``load_pipeline`` at ``:44-49``,
batch loop at ``:186-214``) — and the gazetteer held in module state
(``static_parser.py:19-23``). Here the per-actor state is the MinHasher
permutation table, the memoizing token hasher, compiled comment-strip
regexes, and the per-lang config dict (the broadcast gazetteer analog),
all built once in ``__init__`` and reused for every batch.

Input: normalized corpus (needs ``content``, ``lang``).
Output: drops ``content`` (wide rows must not ride the blocking shuffle) and
adds:
  minhash   fixed-length list<uint64> signature over comment-stripped,
            stop-token-stripped k-token shingles
  simhash   uint64 (for the SimHash near-dup operator)
  n_tokens_sig  int64 — token count entering the signature
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from localhost_address_matching_ray.config import PipelineConfig
from localhost_address_matching_ray.functions.hashing import MinHasher, SimHasher, TokenHasher, shingle_hashes
from localhost_address_matching_ray.functions.normalize import (
    normalize_content,
    strip_comments,
    strip_stop_tokens,
    tokenize,
)

#: columns the feature stage keeps — everything downstream of here is narrow
KEEP_COLUMNS = [
    "row_id", "repo", "path", "commit", "lang", "path_canonical", "stem",
    "content_sha256", "content_sha256_norm", "n_tokens",
]


class FeatureExtractor:
    """Callable-class actor: ``__init__`` once per actor, ``__call__`` per
    batch (`map_batches(FeatureExtractor, concurrency=N)`)."""

    def __init__(self, config: PipelineConfig) -> None:
        self.config = config
        self.minhasher = MinHasher(num_perm=config.num_perm)
        self.simhasher = SimHasher()
        self.token_hasher = TokenHasher()
        self.lang_configs = config.lang_configs
        self._stops = {
            lang: frozenset(lc.stop_tokens) for lang, lc in config.lang_configs.items()
        }

    def _doc_tokens(self, content: str, lang: str) -> list[str]:
        lc = self.lang_configs.get(lang)
        if lc is not None and lc.comment_styles:
            content = strip_comments(content, lc.comment_styles)
        toks = tokenize(normalize_content(content))
        stops = self._stops.get(lang)
        if stops:
            toks = strip_stop_tokens(toks, stops)
        return toks

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch["content"].to_pylist()
        langs = batch["lang"].to_pylist()
        k_default = self.config.shingle_k

        n = len(contents)
        sigs = np.empty((n, self.config.num_perm), dtype=np.uint64)
        simhashes = np.empty(n, dtype=np.uint64)
        n_tok = np.empty(n, dtype=np.int64)
        for i, (c, lg) in enumerate(zip(contents, langs)):
            toks = self._doc_tokens(c, lg)
            lc = self.lang_configs.get(lg)
            k = lc.shingle_k if lc is not None else k_default
            sh = shingle_hashes(toks, k, self.token_hasher)
            sigs[i] = self.minhasher.signature(sh)
            simhashes[i] = self.simhasher.simhash(toks)
            n_tok[i] = len(toks)

        out = batch.select([c for c in KEEP_COLUMNS if c in batch.column_names])
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel(), pa.uint64()), self.config.num_perm
        )
        return (
            out
            .append_column("minhash", sig_col)
            .append_column("simhash", pa.array(simhashes, pa.uint64()))
            .append_column("n_tokens_sig", pa.array(n_tok, pa.int64()))
        )


def extract_features(
    ds: ray.data.Dataset, config: PipelineConfig | None = None
) -> ray.data.Dataset:
    config = config or PipelineConfig()
    return ds.map_batches(
        FeatureExtractor,
        fn_constructor_args=(config,),
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=config.feature_concurrency,
        num_cpus=1,
    )
