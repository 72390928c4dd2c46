"""Vectorized scalar/array kernels used inside ``map_batches`` stages.

Every function here is a pure, deterministic batch kernel (numpy / pyarrow /
hashlib); none touches Ray. This mirrors the reference's split between the
pure normalizer chain (``normalize_address.py``) and the streaming executor
that applies it (``ner_address_parser.py``).
"""
