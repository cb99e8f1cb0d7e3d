"""Reconstruction of the reference's missing ``utils`` package (README.md:11
points at kamwoh/sdc; SURVEY.md §2.9 reconstructs the required API from the
14 in-repo call sites). Original implementations — the upstream code is not
in this mount. ``utils.metrics`` (the one module that DOES exist upstream) is
loaded from the reference file itself so its behavior is authoritative."""
