"""Regenerate golden text files from the spec oracle (SURVEY.md §5.2 item 1).

Run manually (`python tests/gen_goldens.py`), diff-review the output, commit.
The engine is validated against these committed bytes — never against the
oracle directly in CI — so a silent oracle change cannot silently move the
goalposts.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from tests.oracle.jsoup_text import jsoup_text  # noqa: E402

HERE = pathlib.Path(__file__).parent
SRC = HERE / "fixtures" / "html"
DST = HERE / "fixtures" / "golden"


def main() -> None:
    DST.mkdir(parents=True, exist_ok=True)
    for f in sorted(SRC.glob("*.html")):
        text = jsoup_text(f.read_bytes())
        out = DST / (f.stem + ".txt")
        out.write_bytes(text.encode("utf-8"))
        print(f"{f.name}: {len(text)} chars -> {out.name}")


if __name__ == "__main__":
    main()
