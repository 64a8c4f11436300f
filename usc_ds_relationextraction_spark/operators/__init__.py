"""Relational operators of the KG-construction engine: mention detection,
distant-supervision labeling, pair generation, vocab encoding, bipartite
graph builders, skew tooling, and the training-data-pipeline family
(dedup, similarity search, text analysis, multimodal plumbing)."""
