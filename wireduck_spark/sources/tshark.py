"""TsharkRunner: the subprocess seam around tshark (SURVEY.md §7.3).

The reference builds a shell string and popen()s it at bind time, leaking
the pipe on early termination (/root/reference/src/wireduck_extension.cpp:
108-126, 243-247). Deviations here (SURVEY.md §4.4): argv-list spawn (no
shell -> no injection via path/cfilter), lazy spawn in the reader (schema
inference never launches tshark), and context-managed kill on early exit.

Tests inject canned TSV via `lines_source`, so everything above the seam
is testable without tshark installed.
"""

from __future__ import annotations

import subprocess
from collections.abc import Iterator


def build_argv(
    path: str,
    fields: list[str],
    climit: int | None = None,
    cfilter: str | None = None,
) -> list[str]:
    """tshark -r <file> -T fields -e f1 -e f2 ... [-c N] [-Y filter]
    (reference command construction, cpp:108-125, as an argv list)."""
    argv = ["tshark", "-r", path, "-T", "fields"]
    for f in fields:
        argv += ["-e", f]
    if climit is not None:
        argv += ["-c", str(climit)]  # cpp:117-120
    if cfilter:
        argv += ["-Y", cfilter]  # cpp:122-125
    return argv


class TsharkRunner:
    """Spawns tshark lazily and yields decoded TSV lines."""

    def __init__(self, argv: list[str]):
        self.argv = argv
        self._proc: subprocess.Popen | None = None

    def __enter__(self) -> Iterator[str]:
        self._proc = subprocess.Popen(
            self.argv,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        assert self._proc.stdout is not None
        return (line.rstrip("\r\n") for line in self._proc.stdout)

    def __exit__(self, *exc) -> None:
        if self._proc is not None:
            if self._proc.poll() is None:
                self._proc.kill()  # no pipe leak on early termination
            self._proc.wait()


def parse_tsv_line(line: str, n_cols: int) -> list[str] | None:
    """Split one tshark fields line; rows with no cells are skipped
    (cpp:193); missing trailing columns become empty strings."""
    if not line:
        return None
    cells = line.split("\t")
    if len(cells) < n_cols:
        cells += [""] * (n_cols - len(cells))
    return cells[:n_cols]
