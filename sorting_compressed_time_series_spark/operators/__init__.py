"""Engine operators: compressed-domain sort, page merge, rollup, gap-fill,
window variants, retention, and the training-data pipeline ops
(dedup / similarity / text analysis / multimodal plumbing)."""
