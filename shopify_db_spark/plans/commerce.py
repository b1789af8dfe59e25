"""Placeholder module — queries registered in a later milestone."""
