"""Updatable-function registry — user-redefinable engine functions.

Parity with the reference's `update_function_definition` (reference
rust/create_schemamap_schema.sql:149-185) and its listing helpers
(SCHEMA:462-489): a fixed set of WELL-KNOWN function slots users may
redefine (list_tenants, ignored_schemas, …), with create-or-replace
semantics, a validity guard (the reference refuses volatile bodies; here:
the replacement must declare itself side-effect free), and enumeration.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass

_IDENT_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")


@dataclass
class UpdatableFunction:
    name: str
    fn: Callable
    description: str
    builtin: bool = True


class FunctionRegistry:
    """Named, redefinable function slots (the reference's updatable fns)."""

    def __init__(self):
        self._fns: dict[str, UpdatableFunction] = {}

    def register_builtin(self, name: str, fn: Callable, description: str = "") -> None:
        self._fns[name] = UpdatableFunction(name, fn, description, builtin=True)

    def update_function_definition(
        self, name: str, fn: Callable, pure: bool = True
    ) -> str:
        """Replace a function body. Guards mirror the reference: only known
        slots are replaceable (SCHEMA:462-483 enumerates them), identifier
        names only, and impure replacements are refused (the reference
        rejects `volatile` bodies, SCHEMA:170-176)."""
        if not _IDENT_RE.match(name):
            raise ValueError(f"invalid function name: {name!r}")
        if name not in self._fns:
            raise KeyError(
                f"{name!r} is not an updatable function; known: {self.list_updatable_fns()}"
            )
        if not pure:
            raise ValueError(f"refusing non-pure (volatile) definition for {name!r}")
        old = self._fns[name]
        self._fns[name] = UpdatableFunction(name, fn, old.description, builtin=False)
        return name

    def get(self, name: str) -> Callable:
        return self._fns[name].fn

    def list_updatable_fns(self) -> list[str]:
        return sorted(self._fns)

    def describe(self) -> list[dict]:
        return [
            {"name": f.name, "description": f.description, "builtin": f.builtin}
            for f in sorted(self._fns.values(), key=lambda f: f.name)
        ]
