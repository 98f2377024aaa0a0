"""Deterministic synthetic corpus: images, captions, and a synthetic web.

No Spark dependency — importable standalone and inside Arrow UDF
batches.  Everything is a pure function of seeds/URLs: no wall clock,
no network, no global RNG state.
"""
