"""Search layer: queries, similarity, searcher, executor."""
