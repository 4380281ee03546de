"""Ray-Data-native inverted-index + BM25 engine (see README.md)."""

# Bump whenever an index-content-affecting change lands (tokenizer
# semantics, codec layout, docstats schema): cached indexes built by an
# older engine are rebuilt instead of served stale.
ENGINE_VERSION = 7  # 7: impact-ordered doc ids + blk_mindl block bounds
