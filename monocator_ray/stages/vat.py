"""VAT number extraction + validation (SURVEY.md §2 M8).

Mirrors the reference's VatScraper test surface verbatim
(/root/reference/src/mock-servers.MD:14-20): candidates are regex-scanned
from page text; format is validated; the Belgian mod-97 checksum is verified
(`wrongFormat` and `wrongCheckSum` candidates are rejected); a multi-page
site keeps searching page by page until one is found (`noVatOnFirstPage`,
`vatFoundOnSecondPage`) — the early-stop lives in the per-domain rollup (G5),
not here.
"""

from __future__ import annotations

import re

# BE VAT: 10 digits starting with 0 or 1, common separators.  Digit-boundary
# assertions keep candidates from matching inside longer digit runs
# (ADVICE r1); checksum still filters the rest.  NOTE: an optional 'BE'
# prefix group is deliberately ABSENT — it never changed which digit runs
# matched (the lookbehind sits after it) and removing it lets the regex
# engine skip to [01] first-chars, halving the scan cost (hot path: runs on
# every page's full text).
_VAT_CAND = re.compile(
    r"(?<!\d)([01])\s?(\d{3})[.\s]?(\d{3})[.\s]?(\d{3})(?!\d)"
)


def _checksum_ok(digits10: str) -> bool:
    first8 = int(digits10[:8])
    last2 = int(digits10[8:])
    return last2 == 97 - (first8 % 97)


def extract_vat_numbers(text: str) -> list[str]:
    """Unique valid VAT numbers in order of first appearance, normalized to
    'BE' + 10 digits (leading digit 0 or 1)."""
    found: list[str] = []
    seen = set()
    for m in _VAT_CAND.finditer(text):
        digits10 = m.group(1) + m.group(2) + m.group(3) + m.group(4)
        if not _checksum_ok(digits10):
            continue  # wrongCheckSum -> rejected
        norm = "BE" + digits10
        if norm not in seen:
            seen.add(norm)
            found.append(norm)
    return found
