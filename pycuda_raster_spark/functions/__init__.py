"""Scalar-function surface: codecs, cell index, phash, PSNR (SURVEY.md §2.6)."""
