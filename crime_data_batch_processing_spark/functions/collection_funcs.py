"""Collection function library: array / map / JSON (P30-P31).

Populated in Stage 3 (SURVEY.md §7).
"""
