"""Vectorized scalar-function kernels shared by the stages.

Reference analog: the string/regex scalar layer of the reference
(SURVEY.md §2.8 — regex index-collapse IssueSet.py:39-40, path rewrites
report_visualizer.py:325-340, quote-field extraction :261-262), re-expressed as
pyarrow.compute / numpy kernels plus deterministic 64-bit hashing.
"""
