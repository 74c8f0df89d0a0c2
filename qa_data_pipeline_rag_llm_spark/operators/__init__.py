"""Composable DataFrame → DataFrame operators (the SURVEY.md §2 inventory)."""
