"""Error types. Message texts mirror the reference's stable error surface
(``test/query/expect.out:20-23``, ``src/plan/mutate/UpsetPlan.cpp:94-114``)."""

from __future__ import annotations


class GQLiteError(Exception):
    """Base error for the engine."""


class GQLParseError(GQLiteError):
    pass


class GraphNotExistError(GQLiteError):
    def __init__(self, name: str):
        super().__init__(f"graph is not exist: {name}")
        self.name = name


class GroupNotExistError(GQLiteError):
    def __init__(self, name: str):
        super().__init__(f"group is not exist: {name}")
        self.name = name


class KeyTypeMismatchError(GQLiteError):
    """Parity with UpsetPlan.cpp:94-97/111-114 error text."""

    def __init__(self, got: str, want: str):
        super().__init__(f"Input key type is {got}, but require {want}")
        self.got = got
        self.want = want
