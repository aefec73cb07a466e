"""Custom operators the DataFrame API lacks as one-liners.

Each module documents which SURVEY.md §2 row it realizes and the
scale strategy (shuffle count, broadcast choices, state bounds).
"""
