"""Differential parity vs REAL git — the sandbox analog of the
reference's strongest guarantee (glug vs `git ls-files` on 11 repos ×
34 cells, reference test/parity/test_listing.py:15-35).

Seeded pseudo-random repo trees (nested .gitignore scopes, negation,
anchored rules, dir-only rules, `**`/`?`/`[..]` globs, CRLF, unicode
names, nested real repos) are materialized BOTH as an on-disk git
repository and as the engine's entries table. The oracle is
`git ls-files -o --exclude-standard` (untracked-and-not-ignored ==
admitted, since nothing is ever staged); the engine runs
``operators.explorer.explore`` over the table. Sets must be equal,
per cell, for the repo root and for subdirectory listings (which
exercise the outer-filter ancestor walk and the repo-root barrier).

Nested repos are created with a real `git init`: git collapses a valid
embedded repo to `dir/` (never recursing), matching the reference's
submodule skip; an INVALID bare `.git` directory is recursed by real
git, so the generator never fabricates one.
"""

from __future__ import annotations

import os
import random
import subprocess

import pytest

from glug_spark.operators.explorer import explore

GIT_ENV = {
    **os.environ,
    "GIT_CONFIG_GLOBAL": "/dev/null",
    "GIT_CONFIG_SYSTEM": "/dev/null",
}

DIR_NAMES = [
    "src", "docs", "build", ".cache", "temp1", "tempX", "a", "b",
    "nested", "über-dir", "данные", "vendor", "important",
]
FILE_NAMES = [
    "main.c", "main.generated.c", "README.md", "notes.txt", "keep.log",
    "debug.log", "gen", "a.txt", "b.txt", "x.o", "файл.md", "生成.txt",
    "script.sh", "anchored.txt", "data.bin", "über.md",
]
RULE_POOL = [
    "*.log", "!keep.log", "build/", "/anchored.txt", "*.o", "temp?",
    "[ab].txt", "docs/*.md", "**/gen", "*.generated.*", ".cache/",
    "über*", "generated*", "data.*", "# comment", "", "vendor/",
    "!important/", "*.bin", "файл*", "a/**/b.txt",
]


def _gen_tree(rng: random.Random):
    """Deterministic random tree spec: [(relpath, kind, content)].
    kind ∈ {file, dir, repo} — 'repo' dirs get a real `git init`."""
    entries: list[tuple[str, str, str | None]] = []

    def fill(prefix: str, depth: int):
        n_files = rng.randint(1, 5)
        for name in rng.sample(FILE_NAMES, n_files):
            entries.append((f"{prefix}/{name}", "file", None))
        if rng.random() < 0.7:
            rules = rng.sample(RULE_POOL, rng.randint(1, 4))
            eol = "\r\n" if rng.random() < 0.3 else "\n"
            entries.append(
                (f"{prefix}/.gitignore", "file", eol.join(rules) + eol)
            )
        if depth >= 3:
            return
        for name in rng.sample(DIR_NAMES, rng.randint(0, 3)):
            sub = f"{prefix}/{name}"
            if any(p == sub for p, _, _ in entries):
                continue
            if depth >= 1 and rng.random() < 0.12:
                entries.append((sub, "repo", None))
                entries.append((f"{sub}/inner.txt", "file", None))
                continue
            entries.append((sub, "dir", None))
            fill(sub, depth + 1)

    fill("root", 0)
    return entries


def _materialize(entries, tmp: str) -> str:
    disk_root = os.path.join(tmp, "root")
    os.makedirs(disk_root)
    subprocess.run(["git", "init", "-q", disk_root], check=True, env=GIT_ENV)
    for rel, kind, content in entries:
        full = os.path.join(tmp, rel)
        if kind in ("dir", "repo"):
            os.makedirs(full, exist_ok=True)
            if kind == "repo":
                subprocess.run(["git", "init", "-q", full], check=True,
                               env=GIT_ENV)
        else:
            os.makedirs(os.path.dirname(full), exist_ok=True)
            with open(full, "w", encoding="utf-8", newline="") as f:
                f.write(content or "")
    return disk_root


def _table_rows(entries):
    """Entries-table rows incl. the .git markers real init created."""
    rows = [("root/.git", "dir", None)]
    for rel, kind, content in entries:
        if kind == "repo":
            rows.append((rel, "dir", None))
            rows.append((f"{rel}/.git", "dir", None))
        else:
            rows.append((rel, kind, content))
    return rows


def _git_listing(disk_dir: str) -> set[str]:
    out = subprocess.run(
        ["git", "-C", disk_dir, "ls-files", "-o", "--exclude-standard", "-z"],
        check=True, capture_output=True, env=GIT_ENV,
    ).stdout
    return {
        p.decode("utf-8")
        for p in out.split(b"\0")
        if p and not p.endswith(b"/")  # embedded repos collapse to 'dir/'
    }


def _glug_listing(spark, entries, root: str) -> set[str]:
    df = spark.createDataFrame(
        _table_rows(entries), "path string, kind string, content string"
    )
    got = {r["path"] for r in explore(df, root).collect()}
    return {p[len(root) + 1:] for p in got}


def _subdir_cells(entries, rng: random.Random, tmp: str, disk_root: str,
                  max_cells: int = 2):
    """Non-ignored subdirectories only — the reference's parity cells
    (test_listing.py) likewise list only tracked subdirs. Running INSIDE
    an ignored directory is the one place reference semantics diverge
    from git (git refuses to list anything there; the reference's outer
    walk collects the ancestor rules but an unanchored dir rule like
    `.cache/` cannot match deeper basenames, so it lists the contents
    — and this engine matches the reference)."""
    dirs = [p for p, k, _ in entries if k in ("dir", "repo")]
    rng.shuffle(dirs)
    picked = []
    for d in dirs:
        rel = os.path.relpath(os.path.join(tmp, d), disk_root)
        ignored = subprocess.run(
            ["git", "-C", disk_root, "check-ignore", "-q", rel],
            env=GIT_ENV, capture_output=True,
        ).returncode == 0
        if not ignored:
            picked.append(d)
        if len(picked) == max_cells:
            break
    return picked


SEEDS = list(range(12))


@pytest.mark.parametrize("seed", SEEDS)
def test_random_tree_matches_git(spark, seed, tmp_path):
    rng = random.Random(1000 + seed)
    entries = _gen_tree(rng)
    tmp = str(tmp_path)
    disk_root = _materialize(entries, tmp)

    # cell 1: repo root
    want = _git_listing(disk_root)
    got = _glug_listing(spark, entries, "root")
    assert got == want, (
        f"seed={seed} root: only_glug={sorted(got - want)[:10]} "
        f"only_git={sorted(want - got)[:10]}"
    )

    # cells 2..n: subdirectory listings (outer-filter walk + barriers)
    for sub in _subdir_cells(entries, rng, tmp, disk_root):
        want = _git_listing(os.path.join(tmp, sub))
        got = _glug_listing(spark, entries, sub)
        assert got == want, (
            f"seed={seed} subdir={sub}: only_glug={sorted(got - want)[:10]} "
            f"only_git={sorted(want - got)[:10]}"
        )


# --- handcrafted adversarial cells --------------------------------------

HANDCRAFTED = [
    (
        "crlf_and_comments",
        [
            ("root/.gitignore", "file", "# hdr\r\n\r\n*.log\r\n!keep.log\r\n"),
            ("root/keep.log", "file", None),
            ("root/drop.log", "file", None),
            ("root/ok.txt", "file", None),
        ],
    ),
    (
        "anchored_vs_unanchored",
        [
            ("root/.gitignore", "file", "/top.txt\nsub.txt\n"),
            ("root/top.txt", "file", None),
            ("root/sub.txt", "file", None),
            ("root/d", "dir", None),
            ("root/d/top.txt", "file", None),
            ("root/d/sub.txt", "file", None),
        ],
    ),
    (
        "dir_only_rule_vs_file",
        [
            ("root/.gitignore", "file", "build/\n"),
            ("root/build", "dir", None),
            ("root/build/out.o", "file", None),
            ("root/d", "dir", None),
            ("root/d/build", "file", None),  # FILE named build survives
        ],
    ),
    (
        "negation_cannot_resurrect_pruned",
        [
            ("root/.gitignore", "file", "gen/\n!gen/keep.txt\n"),
            ("root/gen", "dir", None),
            ("root/gen/keep.txt", "file", None),
            ("root/gen/drop.txt", "file", None),
            ("root/ok.txt", "file", None),
        ],
    ),
    (
        "inner_scope_overrides_outer",
        [
            ("root/.gitignore", "file", "*.md\n"),
            ("root/a.md", "file", None),
            ("root/d", "dir", None),
            ("root/d/.gitignore", "file", "!b.md\n"),
            ("root/d/b.md", "file", None),
            ("root/d/c.md", "file", None),
        ],
    ),
    (
        "doublestar_middle",
        [
            ("root/.gitignore", "file", "a/**/z.txt\n"),
            ("root/a", "dir", None),
            ("root/a/z.txt", "file", None),
            ("root/a/b", "dir", None),
            ("root/a/b/z.txt", "file", None),
            ("root/z.txt", "file", None),
        ],
    ),
    (
        "charclass_negated",
        [
            ("root/.gitignore", "file", "[!a]*.txt\n"),
            ("root/ax.txt", "file", None),
            ("root/bx.txt", "file", None),
            ("root/cx.txt", "file", None),
        ],
    ),
    (
        "unicode_rules_and_names",
        [
            ("root/.gitignore", "file", "файл*\n генерир*\n"),
            ("root/файл.md", "file", None),
            ("root/файлы.txt", "file", None),
            ("root/данные.csv", "file", None),
            ("root/d", "dir", None),
            ("root/d/файл2.md", "file", None),
        ],
    ),
    (
        "question_mark_no_slash",
        [
            ("root/.gitignore", "file", "temp?\n"),
            ("root/temp1", "file", None),
            ("root/tempXY", "file", None),
            ("root/temp", "file", None),
        ],
    ),
    (
        "trailing_spaces_stripped",
        [
            ("root/.gitignore", "file", "*.log   \nkeep.txt\t\n"),
            ("root/a.log", "file", None),
            ("root/keep.txt", "file", None),
        ],
    ),
]


@pytest.mark.parametrize(
    "name,entries", HANDCRAFTED, ids=[n for n, _ in HANDCRAFTED]
)
def test_handcrafted_matches_git(spark, name, entries, tmp_path):
    tmp = str(tmp_path)
    disk_root = _materialize(entries, tmp)
    want = _git_listing(disk_root)
    got = _glug_listing(spark, entries, "root")
    assert got == want, (
        f"{name}: only_glug={sorted(got - want)} only_git={sorted(want - got)}"
    )


# --- realistic wide-rule profiles ----------------------------------------
# Shapes matched to the reference's real-repo parity corpus
# (test/parity/repos.py:41-54): linux-style = one huge root ignore file
# with **/anchored/negated rules over a deep tree; godot-style = very
# wide root file, many dir-only rules; monorepo = a .gitignore in nearly
# every directory, dozens of rules each.

_EXTS = ["o", "ko", "log", "tmp", "bak", "gen", "pyc", "obj", "out", "map"]


# --- real-world corpora: vendored public .gitignore templates -----------
# (tests/gitignore_corpora.py — canonical github/gitignore templates +
# linux/godot-shaped rule files, per the reference's pinned-repo parity
# suite, test/parity/repos.py:41-54)

from tests.gitignore_corpora import CORPORA  # noqa: E402


@pytest.mark.parametrize(
    "name,entries", CORPORA, ids=[n for n, _ in CORPORA]
)
def test_real_corpus_matches_git(spark, name, entries, tmp_path):
    tmp = str(tmp_path)
    disk_root = _materialize(entries, tmp)

    want = _git_listing(disk_root)
    got = _glug_listing(spark, entries, "root")
    assert got == want, (
        f"corpus={name} root: only_glug={sorted(got - want)[:10]} "
        f"only_git={sorted(want - got)[:10]}"
    )
    # subdirectory cells: the ancestor-filter walk against real rules
    # (crc32, not hash(): str hash is salted per process — an unstable
    # seed would make the exercised cells irreproducible across runs)
    import zlib

    rng = random.Random(zlib.crc32(name.encode()))
    for sub in _subdir_cells(entries, rng, tmp, disk_root):
        want = _git_listing(os.path.join(tmp, sub))
        got = _glug_listing(spark, entries, sub)
        assert got == want, (
            f"corpus={name} subdir={sub}: "
            f"only_glug={sorted(got - want)[:10]} "
            f"only_git={sorted(want - got)[:10]}"
        )


def _wide_rules(rng: random.Random, n: int) -> list[str]:
    rules = []
    for i in range(n):
        r = rng.random()
        ext = _EXTS[i % len(_EXTS)]
        if r < 0.30:
            rules.append(f"*.{ext}")
        elif r < 0.45:
            rules.append(f"build_{i % 23}/")
        elif r < 0.60:
            rules.append(f"/top_{i % 7}/gen_{i % 13}.txt")
        elif r < 0.72:
            rules.append(f"**/cache_{i % 11}")
        elif r < 0.82:
            rules.append(f"doc_{i % 9}?.md")
        elif r < 0.90:
            rules.append(f"[ab]tmp_{i % 5}*")
        elif r < 0.96:
            rules.append(f"!keep_{i % 17}.{ext}")
        else:
            rules.append(f"!important_{i % 3}/")
    return rules


def _profile_names(rng: random.Random) -> list[str]:
    names = []
    for i in range(rng.randint(3, 7)):
        r = rng.random()
        if r < 0.3:
            names.append(f"f{i}.{_EXTS[rng.randrange(len(_EXTS))]}")
        elif r < 0.5:
            names.append(f"keep_{rng.randrange(20)}.{_EXTS[i % len(_EXTS)]}")
        elif r < 0.65:
            names.append(f"gen_{rng.randrange(15)}.txt")
        elif r < 0.8:
            names.append(f"cache_{rng.randrange(13)}")
        elif r < 0.9:
            names.append(f"doc_{rng.randrange(10)}{rng.randrange(10)}.md")
        else:
            names.append(f"{'ab'[i % 2]}tmp_{rng.randrange(6)}x")
    return list(dict.fromkeys(names))


def _gen_profile_tree(rng: random.Random, profile: str):
    entries: list[tuple[str, str, str | None]] = []
    if profile == "linux":
        root_rules, per_dir_rules, depth, fanout = 250, 0, 5, 2
    elif profile == "godot":
        root_rules, per_dir_rules, depth, fanout = 400, 0, 3, 3
    else:  # monorepo
        # root file alone guarantees the ≥200-rule width floor even for
        # sparse trees; per-dir files add the many-scopes shape
        root_rules, per_dir_rules, depth, fanout = 200, 45, 4, 2

    entries.append((
        "root/.gitignore", "file",
        "\n".join(_wide_rules(rng, root_rules)) + "\n",
    ))

    def fill(prefix: str, d: int):
        for name in _profile_names(rng):
            entries.append((f"{prefix}/{name}", "file", None))
        if per_dir_rules and prefix != "root" and rng.random() < 0.8:
            entries.append((
                f"{prefix}/.gitignore", "file",
                "\n".join(_wide_rules(rng, per_dir_rules)) + "\n",
            ))
        if d >= depth:
            return
        subs = rng.sample(
            [f"top_{rng.randrange(8)}", f"build_{rng.randrange(25)}",
             f"sub_{d}_{rng.randrange(9)}", f"important_{rng.randrange(4)}",
             "src", "tools"],
            rng.randint(1, fanout),
        )
        for name in dict.fromkeys(subs):
            sub = f"{prefix}/{name}"
            if any(p == sub for p, _, _ in entries):
                continue
            entries.append((sub, "dir", None))
            fill(sub, d + 1)

    fill("root", 0)
    return entries


@pytest.mark.parametrize("profile", ["linux", "godot", "monorepo"])
@pytest.mark.parametrize("seed", [0, 1])
def test_wide_rule_profile_matches_git(spark, profile, seed, tmp_path):
    import zlib

    rng = random.Random(7000 + seed * 31 + zlib.crc32(profile.encode()) % 1000)
    entries = _gen_profile_tree(rng, profile)
    n_rules = sum(
        (c or "").count("\n")
        for p, k, c in entries if p.endswith(".gitignore")
    )
    assert n_rules >= 200, f"profile not wide enough: {n_rules} rules"
    tmp = str(tmp_path)
    disk_root = _materialize(entries, tmp)

    want = _git_listing(disk_root)
    got = _glug_listing(spark, entries, "root")
    assert got == want, (
        f"{profile}/{seed} root: only_glug={sorted(got - want)[:10]} "
        f"only_git={sorted(want - got)[:10]}"
    )
    for sub in _subdir_cells(entries, rng, tmp, disk_root):
        want = _git_listing(os.path.join(tmp, sub))
        got = _glug_listing(spark, entries, sub)
        assert got == want, (
            f"{profile}/{seed} subdir={sub}: "
            f"only_glug={sorted(got - want)[:10]} "
            f"only_git={sorted(want - got)[:10]}"
        )


def _fs_listing(spark, disk_root: str) -> set[str]:
    """The real-filesystem entry path (fs_entries → explore), root cell."""
    from glug_spark.operators.explorer import explore, fs_entries

    rows = fs_entries(disk_root)
    df = spark.createDataFrame(
        rows, "path string, kind string, content string"
    )
    got = {r["path"] for r in explore(df, "root").collect()}
    return {p[len("root") + 1:] for p in got}


@pytest.mark.parametrize("seed", [2, 5, 9])
def test_fs_walk_matches_git(spark, seed, tmp_path):
    """fs_entries (the CLI `explore` path: REAL directory walk → entries
    table) must produce the same admitted listing as git on disk."""
    rng = random.Random(1000 + seed)
    entries = _gen_tree(rng)
    tmp = str(tmp_path)
    disk_root = _materialize(entries, tmp)
    want = _git_listing(disk_root)
    got = _fs_listing(spark, disk_root)
    assert got == want, (
        f"seed={seed}: only_glug={sorted(got - want)[:10]} "
        f"only_git={sorted(want - got)[:10]}"
    )


def test_fs_walk_matches_git_wide_profile(spark, tmp_path):
    rng = random.Random(7300)
    entries = _gen_profile_tree(rng, "monorepo")
    tmp = str(tmp_path)
    disk_root = _materialize(entries, tmp)
    want = _git_listing(disk_root)
    got = _fs_listing(spark, disk_root)
    assert got == want


@pytest.mark.parametrize(
    "name", ["python_template", "linux_shaped", "unity_template"]
)
def test_fs_walk_matches_git_real_corpus(spark, name, tmp_path):
    """The REAL-filesystem walk path (CLI `explore`) against the
    vendored real-world rule corpora — same rule sets, different entry
    source (disk walk instead of the entries table)."""
    entries = dict(CORPORA)[name]
    tmp = str(tmp_path)
    disk_root = _materialize(entries, tmp)
    want = _git_listing(disk_root)
    got = _fs_listing(spark, disk_root)
    assert got == want, (
        f"corpus={name}: only_glug={sorted(got - want)[:10]} "
        f"only_git={sorted(want - got)[:10]}"
    )
