"""Scalar/column function library (native Column expressions only)."""
