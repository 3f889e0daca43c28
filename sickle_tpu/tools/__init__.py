"""Ecosystem tooling around the core CLI (reference L7 layer,
SURVEY.md §1: trim_all.py batch driver, Galaxy wrapper)."""
