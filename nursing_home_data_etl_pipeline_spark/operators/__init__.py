"""Operator library: pure ``DataFrame -> DataFrame`` functions.

Each module maps to a SURVEY.md §2 family; docstrings cite the reference
behavior (file:line under /root/reference) each operator re-expresses.
"""
