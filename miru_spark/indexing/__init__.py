"""Index-build jobs: postings construction, blocks, stats, segments, merge."""
