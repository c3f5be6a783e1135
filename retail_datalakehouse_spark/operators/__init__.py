"""Operator library: reusable building blocks behind the query registry."""
