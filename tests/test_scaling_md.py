"""SCALING.md section-regeneration safety.

Round-10 verdict, "What's wrong" #1: streaming_throughput.py's old
section rewrite truncated the file from its own header to EOF,
destroying every section written after it (the sf100 third-decade
table). Every regenerator now routes through bench.splice_section —
these tests pin the splice semantics (unrelated sections AND their
order survive any single-section rewrite) and that each section-owning
script actually uses the shared helper, so a future hand-rolled
rewrite can't silently reintroduce the truncation class.
"""

import os
import re

from bench import SCALING_STREAM_HEADER, splice_section

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOC = (
    "# Scaling\n\npreamble\n"
    "\n## Alpha\n\nbody a\n| r | 1 |\n"
    "\n## Beta\n\nbody b\n"
    "\n## Gamma\n\nbody c\n"
)


def test_replace_middle_section_preserves_others_and_order():
    out = splice_section(DOC, "\n## Beta\n", "\n## Beta\n\nNEW b\n")
    assert "body a" in out and "| r | 1 |" in out
    assert "body c" in out
    assert "body b" not in out and "NEW b" in out
    # order preserved: Alpha before Beta before Gamma
    assert out.index("## Alpha") < out.index("## Beta") < out.index("## Gamma")
    # idempotent: replacing again with the same section is a no-op
    assert splice_section(out, "\n## Beta\n", "\n## Beta\n\nNEW b\n") == out


def test_replace_first_and_last_sections():
    out = splice_section(DOC, "\n## Alpha\n", "\n## Alpha\n\nNEW a\n")
    assert "NEW a" in out and "body b" in out and "body c" in out
    out = splice_section(DOC, "\n## Gamma\n", "\n## Gamma\n\nNEW c\n")
    assert "body a" in out and "body b" in out and "NEW c" in out
    assert out.index("## Beta") < out.index("## Gamma")


def test_missing_header_appends_without_touching_existing():
    out = splice_section(DOC, "\n## Delta\n", "\n## Delta\n\nbody d\n")
    for frag in ("body a", "body b", "body c", "body d"):
        assert frag in out
    assert out.index("## Gamma") < out.index("## Delta")


def test_section_must_start_with_its_header():
    try:
        splice_section(DOC, "\n## Beta\n", "\nwrong start\n")
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError")


def test_every_section_regenerator_uses_splice_section():
    # the four scripts that own a SCALING.md section; scaling_curve.py
    # owns the file HEAD and preserves the tail from the streaming
    # header on, which is checked separately below
    for script in (
        "streaming_throughput.py",
        "ivm_marginal_day.py",
        "neardup_increment.py",
        "sf100_decade.py",
    ):
        src = open(os.path.join(REPO, "scripts", script)).read()
        assert "splice_section" in src, (
            f"{script} regenerates a SCALING.md section without the "
            "shared order-preserving splice"
        )
        # the truncation footgun: find(header) followed by a slicing
        # rewrite; cheap signature check
        assert not re.search(r"existing\[\s*:\s*cut\s*\]", src), script


def test_scaling_curve_preserves_streaming_tail():
    src = open(os.path.join(REPO, "scripts", "scaling_curve.py")).read()
    assert "SCALING_STREAM_HEADER" in src


def test_shipped_scaling_md_has_all_sections():
    md = open(os.path.join(REPO, "SCALING.md")).read()
    for header in (
        SCALING_STREAM_HEADER.strip(),
        "## IVM marginal-day maintenance",
        "## Maintained near-dup index: marginal increment",
        "## sf100 third decade",
    ):
        assert header in md, f"SCALING.md lost its '{header}' section"
