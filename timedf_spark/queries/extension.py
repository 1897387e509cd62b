"""Extension-layer suite placeholder — populated by operators/ modules.

Filled in as dedup/similarity/text/sessionize operators land; kept separate
so queries/__init__ imports cleanly from the first commit.
"""

from __future__ import annotations

SUITE: dict = {}
