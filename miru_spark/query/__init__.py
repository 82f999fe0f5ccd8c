"""Query layer: parser → filter AST → DataFrame plan → BM25 top-k."""
