"""SURVEY.md §7.4(5) / input_hint: no per-row Python in the engine hot path.
Greps engine/ for row-at-a-time UDF registration and RDD lambda usage."""

import pathlib
import re

ENGINE = pathlib.Path(__file__).parent.parent / "engine"


def test_no_row_udf_or_rdd_map():
    bad = []
    for p in ENGINE.glob("*.py"):
        src = p.read_text()
        # .rdd / flatMap are reachable only through .rdd, which is caught
        for pat in (r"\bF\.udf\(", r"pandas_udf\(", r"\.rdd\b",
                    r"\.map\(lambda"):
            for m in re.finditer(pat, src):
                line = src[:m.start()].count("\n") + 1
                snippet = src.splitlines()[line - 1].strip()
                if "#" in snippet and snippet.index("#") < snippet.find(
                        m.group(0).strip(".")):
                    continue
                if "unpersist" in snippet:
                    # JVM-side storage release via the LogicalRDD handle
                    # (_free_local_checkpoint) — frees checkpoint blocks,
                    # never a per-row compute path
                    continue
                bad.append(f"{p.name}:{line}: {snippet}")
    assert not bad, "per-row Python in hot path:\n" + "\n".join(bad)
