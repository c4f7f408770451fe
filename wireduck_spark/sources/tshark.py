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


class FakeTsharkRunner:
    """Drop-in TsharkRunner that emulates `tshark -T fields` with the
    native dissector: reads the argv's capture file, emits one TSV line
    per packet with the `-e`-requested fields, honoring `-c N`.

    Test seam for containers without a tshark binary (activated by the
    `tshark_mock_engine=native` reader option): unlike canned-TSV mocks
    it actually CONSUMES the file the argv names, which is what the
    split-tshark path needs verified — that each per-slice temp capture
    is a well-formed standalone file whose dissection matches the
    whole-file read. Field coverage is the native dissector's 15
    protocols; display filters (-Y) are not emulated (the translation
    layer is unit-tested separately and Spark re-applies every filter).
    """

    def __init__(self, argv: list[str]):
        self.argv = argv

    def __enter__(self) -> Iterator[str]:
        from wireduck_spark.sources.native import iter_packets

        path = self.argv[self.argv.index("-r") + 1]
        fields = [self.argv[i + 1] for i, a in enumerate(self.argv)
                  if a == "-e"]
        climit = (int(self.argv[self.argv.index("-c") + 1])
                  if "-c" in self.argv else None)

        def cell(pkt: dict, name: str) -> str:
            if name == "frame.time_epoch":
                # tshark prints epoch seconds with sub-second decimals
                return f"{pkt['frame.time_epoch'] / 1_000_000:.6f}"
            v = pkt.get(name)
            if v is None:
                return ""
            if isinstance(v, bool):
                return "1" if v else "0"  # FT_BOOLEAN parse rule (cpp:214)
            return str(v)

        def lines() -> Iterator[str]:
            for i, pkt in enumerate(iter_packets(path, raw_ts=True)):
                if climit is not None and i >= climit:
                    break
                # whole-file read: iter_packets emits ordinal frame.number,
                # exactly like tshark on the same file
                yield "\t".join(cell(pkt, f) for f in fields)

        return lines()

    def __exit__(self, *exc) -> None:
        pass


def parse_tsv_line(line: str, n_cols: int) -> list[str] | None:
    """Split one tshark fields line; rows with no cells are skipped
    (cpp:193); missing trailing columns become empty strings."""
    if not line:
        return None
    cells = line.split("\t")
    if len(cells) < n_cols:
        cells += [""] * (n_cols - len(cells))
    return cells[:n_cols]
