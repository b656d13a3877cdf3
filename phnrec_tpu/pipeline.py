"""Pipeline orchestration (placeholder; filled in after core layers)."""


class SpeechRec:  # pragma: no cover - stub
    pass
