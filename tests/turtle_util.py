"""Shim: the turtle reader moved into the package (kgx.turtle)."""
from kgx.turtle import parse_turtle  # noqa: F401
