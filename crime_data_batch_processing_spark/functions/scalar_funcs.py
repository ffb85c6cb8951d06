"""Scalar function library: string / date / math / conditional (P26-P29).

Populated in Stage 3 (SURVEY.md §7).
"""
