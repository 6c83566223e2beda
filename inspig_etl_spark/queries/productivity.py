"""Placeholder — populated later this round."""
