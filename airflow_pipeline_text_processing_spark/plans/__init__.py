"""Composable DataFrame plans: the reference pipeline + the query surface."""
