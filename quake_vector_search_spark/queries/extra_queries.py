"""Round-2+ query additions.

Loaded AFTER the driver's 50-entry correctness window (see
queries/__init__.py::load_all_query_modules) so new entries never push
core-surface queries out of the externally-verified prefix; everything
here is still covered by the local oracle gate (tools/check_oracle.py).
"""

from __future__ import annotations
