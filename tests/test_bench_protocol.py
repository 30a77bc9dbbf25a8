"""bench.py measurement-protocol invariants (no Spark session needed).

The code fingerprint decides whether a bench run MERGES into the
committed best-of-runs artifact or OVERWRITES it. Round 9's process
defect: a docstring-only commit rotated the blob-based fingerprint, so
the driver's single run overwrote a best-of-4 artifact. The fingerprint
is therefore SEMANTIC — AST minus docstrings — and these tests pin that
contract.
"""

from __future__ import annotations

from pathlib import Path

import bench

ENGINE_INIT = Path(
    "/root/repo/sql_data_warehouse_analytics_project_spark/__init__.py"
)


def test_semantic_digest_ignores_comments_and_docstrings():
    base = b'''
"""Module doc."""

def f(x):
    """f doc."""
    return x + 1


class C:
    """C doc."""

    def g(self):
        return 2
'''
    cosmetic = b'''
"""A completely rewritten module docstring.

With extra lines.
"""

# a new comment block
def f(x):
    # inline commentary
    return x + 1  # trailing note


class C:
    def g(self):
        """g grew a docstring."""
        return 2
'''
    behavioral = base.replace(b"return x + 1", b"return x + 2")
    assert bench._semantic_digest(base) == bench._semantic_digest(cosmetic)
    assert bench._semantic_digest(base) != bench._semantic_digest(behavioral)


def test_semantic_digest_falls_back_on_syntax_error():
    bad = b"def broken(:\n"
    # non-parseable sources hash by content — still deterministic
    assert bench._semantic_digest(bad) == bench._semantic_digest(bad)
    assert bench._semantic_digest(bad) != bench._semantic_digest(bad + b"x")


def test_code_fingerprint_stable_and_docstring_insensitive(tmp_path):
    # probe a THROWAWAY git tree holding a copy of a measured engine
    # file — the live working tree is never written (a hard kill
    # mid-test used to leave it dirty and rotate the bench fingerprint)
    import subprocess

    pkg = tmp_path / "sql_data_warehouse_analytics_project_spark"
    pkg.mkdir()
    probe = pkg / "__init__.py"
    original = ENGINE_INIT.read_bytes()
    probe.write_bytes(original)
    subprocess.run(
        ["git", "init", "-q"], cwd=tmp_path, check=True, timeout=30
    )
    root = str(tmp_path)

    fp0 = bench._code_fingerprint(root=root)
    assert fp0 is not None and len(fp0) == 24
    assert bench._code_fingerprint(root=root) == fp0

    # a comment appended to a MEASURED engine file must not rotate the
    # fingerprint (the round-9 overwrite trigger)
    probe.write_bytes(original + b"\n# bench fingerprint probe\n")
    assert bench._code_fingerprint(root=root) == fp0
    # an executable change MUST rotate it
    probe.write_bytes(original + b"\n_BENCH_PROBE = 1\n")
    assert bench._code_fingerprint(root=root) != fp0
    probe.write_bytes(original)
    assert bench._code_fingerprint(root=root) == fp0

    # the live tree's fingerprint computes read-only
    assert bench._code_fingerprint() is not None


def test_merge_guard_requires_matching_core_count(tmp_path):
    """A prior artifact merges only at the same (fingerprint, sf, cpus):
    the round-11 driver's 8-core run merged 32-core minima because the
    guard omitted the core count, flattening the scaling block."""
    import json

    path = str(tmp_path / "bench_result.json")
    art = {
        "complete": True,
        "code_fingerprint": "f" * 24,
        "sf": 0.1,
        "cpus": 32,
        "queries": {"q01": 1.0},
    }
    path_obj = tmp_path / "bench_result.json"
    path_obj.write_text(json.dumps(art))

    assert bench._load_prior(path, "f" * 24, 0.1, 32) is not None
    # a different core count must NOT merge
    assert bench._load_prior(path, "f" * 24, 0.1, 8) is None
    # different code or scale never merged; still true
    assert bench._load_prior(path, "e" * 24, 0.1, 32) is None
    assert bench._load_prior(path, "f" * 24, 0.01, 32) is None
    # pre-cpus-field artifacts (no "cpus" key) never merge
    del art["cpus"]
    path_obj.write_text(json.dumps(art))
    assert bench._load_prior(path, "f" * 24, 0.1, 32) is None
