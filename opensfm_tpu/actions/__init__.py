"""Library-level entry points, one per pipeline command.

Mirror of reference `opensfm/actions/` (SURVEY.md §1.2).
"""
