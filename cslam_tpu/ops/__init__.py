"""Jitted numeric cores (XLA + Pallas) for the hot loops of the framework."""
