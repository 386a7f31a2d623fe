"""The annotation gate runs in the default suite: every annotation in the
package must resolve and no parameter may default to None without an
Optional type (the in-environment half of the mypy gate — mypy.ini is the
other half; reference analogue /root/reference/mypy.ini:1)."""

from __future__ import annotations


def test_package_annotations_resolve() -> None:
    from chessvision_tpu.typecheck import run

    errors = run()
    assert not errors, "annotation drift:\n" + "\n".join(errors)


def test_checker_catches_bad_annotation() -> None:
    """The gate itself must actually detect breakage (no vacuous pass)."""
    import types

    from chessvision_tpu.typecheck import check_module

    mod = types.ModuleType("fake_mod")
    src = (
        "from __future__ import annotations\n"
        "def broken(x: NoSuchType) -> None: ...\n"
        "def implicit(x: int = None) -> None: ...\n"
    )
    exec(compile(src, "<fake>", "exec"), mod.__dict__)
    mod.broken.__module__ = "fake_mod"
    mod.implicit.__module__ = "fake_mod"
    errors: list[str] = []
    check_module(mod, errors)
    assert any("NoSuchType" in e or "unresolvable" in e for e in errors), errors
    assert any("implicit" in e and "Optional" in e for e in errors), errors
