"""Engine operators (SURVEY.md §2): decode/tiling, focal stencil, spatial
joins, zonal stats, dedup, similarity, text analysis."""
