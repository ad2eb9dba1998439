r"""termlog.py — tee stdin to a log file, collapsing \r progress lines.

Capability parity with reference `tools/termlog.py:23-68`: everything read
from stdin is mirrored verbatim to the terminal, while the log file keeps
only the final state of each carriage-return-overwritten line (so progress
bars become a single clean line).

Usage: command | python tools/termlog.py OUTPUT_FILE
"""

from __future__ import annotations

import sys


class LineCollapser:
    r"""Accumulates a stream and emits newline-terminated lines to a sink,
    discarding everything that a later ``\r`` on the same line overwrote."""

    def __init__(self, sink):
        self._sink = sink
        self._partial = ""

    def feed(self, chunk: str) -> None:
        data = self._partial + chunk
        *complete, self._partial = data.split("\n")
        for line in complete:
            # a trailing \r (CRLF line ending) carries no overwrite — the
            # text before it is the final visible state
            self._emit(line.rstrip("\r").rsplit("\r", 1)[-1] + "\n")
        # A \r with no newline yet still invalidates what came before it.
        self._partial = self._partial.rsplit("\r", 1)[-1]

    def close(self) -> None:
        if self._partial:
            self._emit(self._partial)
            self._partial = ""

    def _emit(self, text: str) -> None:
        self._sink.write(text)
        self._sink.flush()


def process_stream(input_stream, output_file, stdout) -> None:
    collapser = LineCollapser(output_file)
    # Read one character at a time so live progress bars stay live on the
    # mirrored terminal instead of arriving in buffered bursts.
    for char in iter(lambda: input_stream.read(1), ""):
        stdout.write(char)
        stdout.flush()
        collapser.feed(char)
    collapser.close()


def main() -> None:
    if len(sys.argv) != 2:
        print(f"Usage: {sys.argv[0]} OUTPUT_FILE")
        sys.exit(1)
    try:
        with open(sys.argv[1], "w", encoding="utf-8") as log:
            process_stream(sys.stdin, log, sys.stdout)
    except KeyboardInterrupt:
        print("\nInterrupted by user. Exiting.")
        sys.exit(0)


if __name__ == "__main__":
    main()
