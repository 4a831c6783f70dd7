"""Simplicial data layer: lifting, static-shape batching, array datasets,
and the four task dataset facades (reference ``csmpn/data/``, SURVEY.md
C15-C19b, C35-C38)."""
