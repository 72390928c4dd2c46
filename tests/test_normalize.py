"""Golden input→output pairs for the normalizer kernels — the analog of the
reference's ``test/test_normalize.py`` (20 exact pairs per pipeline variant)
plus the idempotence property (``normalize_address.py:290-296``)."""

import pytest

from localhost_address_matching_ray.functions.normalize import (
    canonicalize_path,
    normalize_content,
    path_stem,
    strip_comments,
    token_count_array,
    tokenize,
)

PATH_GOLDEN = [
    ("src/Main.PY", "src/main.py"),
    ("./src//utils\\io.py", "src/utils/io.py"),
    ("/Lib/Foo-Bar.js", "lib/foo-bar.js"),
    ("a/./b.c", "a/./b.c"),          # inner ./ is data, only leading stripped
    ("././x.go", "x.go"),
    ("SRC\\\\PKG\\MOD.JAVA", "src/pkg/mod.java"),
    ("  spaced/path.md", "spaced/path.md"),
]

STEM_GOLDEN = [
    ("src/main.py", "main"),
    ("lib/foo-bar.js", "foo_bar"),
    ("a/b/data loader.go", "data_loader"),
    ("x/.hidden", "_hidden"),        # leading-dot file keeps its name
    ("pkg/mod.test.java", "mod_test"),
    ("noext", "noext"),
    ("w/weird~~name!.c", "weird_name_"),  # input is already canonical (lowercase)
]

CONTENT_GOLDEN = [
    ("a  b\tc\n\nd ", "a b c d"),
    ("", ""),
    ("  \n ", ""),
    ("one", "one"),
    ("x\r\ny", "x y"),
]


@pytest.mark.parametrize("raw,expected", PATH_GOLDEN)
def test_canonicalize_path_golden(raw, expected):
    assert canonicalize_path(raw) == expected


@pytest.mark.parametrize("raw,expected", PATH_GOLDEN)
def test_canonicalize_path_idempotent(raw, expected):
    assert canonicalize_path(canonicalize_path(raw)) == canonicalize_path(raw)


@pytest.mark.parametrize("path,expected", STEM_GOLDEN)
def test_path_stem_golden(path, expected):
    assert path_stem(path) == expected


@pytest.mark.parametrize("raw,expected", CONTENT_GOLDEN)
def test_normalize_content_golden(raw, expected):
    assert normalize_content(raw) == expected
    assert normalize_content(normalize_content(raw)) == normalize_content(raw)


def test_tokenize():
    assert tokenize("a b c") == ["a", "b", "c"]
    assert tokenize("") == []


def test_strip_comments_hash():
    src = "x = 1  # set x\ny = 2\n# whole line\nz = 3"
    out = strip_comments(src, ("#",))
    assert "#" not in out and "set x" not in out and "y = 2" in out


def test_strip_comments_block_and_line():
    src = "int a; // tail\n/* multi\nline */ int b;"
    out = strip_comments(src, ("//", "/*"))
    assert "tail" not in out and "multi" not in out and "int b;" in out


def test_token_count_array():
    counts = token_count_array(["a b  c", "", "  ", "single"])
    assert counts.tolist() == [3, 0, 0, 1]
