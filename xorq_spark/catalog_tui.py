"""Terminal UI for the expression catalog — browse entries, versions,
fingerprints and git history; trigger replay — mirroring the reference's
catalog TUI surface (/root/reference/python/xorq/catalog/tui.py) on
stdlib curses instead of a TUI framework dependency.

Architecture: `TuiModel` is a PURE state machine (rows, cursor, filter,
detail pane, key handling) with no terminal dependency — that is what
the tests drive. `run_tui` is a thin curses render loop over the model,
gated on a real TTY so headless environments get a clean error instead
of a curses crash. `xorq-spark catalog tui` is the CLI entry.

Replay is the one action that executes anything (it re-runs the
cataloged build against current sources — see catalog.replay); it is
invoked lazily per keypress, never on browse.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from xorq_spark import catalog as _cat


def _fmt_ts(added_at) -> str:
    """'2026-08-16T01:23:45.678+00:00' -> '2026-08-16 01:23'."""
    if not added_at or not isinstance(added_at, str):
        return "-"
    return added_at[:16].replace("T", " ")


class TuiModel:
    """Pure catalog-browser state: list view over entries, detail view
    over one entry's versions, '/'-filter, lazy replay results."""

    LIST, DETAIL = "list", "detail"

    def __init__(
        self,
        root: Optional[str] = None,
        replay_fn: Optional[Callable[[str, Optional[str]], dict]] = None,
    ):
        self.root = root or _cat.catalog_root()
        self.mode = self.LIST
        self.cursor = 0
        self.filter = ""
        self.typing_filter = False
        self.status = ""
        self.detail_name: Optional[str] = None
        self.detail_cursor = 0
        self._replay_fn = replay_fn or (
            lambda name, version: _cat.replay(name, version, self.root)
        )
        self._replay_cache: dict = {}
        self.refresh()

    # ------------------------------------------------------------ data

    def refresh(self) -> None:
        self.entries = sorted(_cat.ls(self.root).items())
        self.cursor = min(self.cursor, max(0, len(self.rows()) - 1))

    def rows(self) -> List[tuple]:
        """Visible (name, latest_hash) rows under the current filter."""
        f = self.filter.lower()
        return [e for e in self.entries if f in e[0].lower()]

    def selected(self) -> Optional[str]:
        rows = self.rows()
        if not rows:
            return None
        return rows[min(self.cursor, len(rows) - 1)][0]

    def versions(self) -> List[dict]:
        if self.detail_name is None:
            return []
        return list(reversed(_cat.history(self.detail_name, self.root)))

    # ------------------------------------------------------------ keys

    def handle_key(self, key: str) -> bool:
        """Apply one keypress; returns False when the TUI should exit."""
        if self.typing_filter:
            if key in ("\n", "ESC"):
                self.typing_filter = False
            elif key in ("BACKSPACE", "\x7f"):
                self.filter = self.filter[:-1]
            elif len(key) == 1 and key.isprintable():
                self.filter += key
            self.cursor = 0
            return True
        if key == "q":
            if self.mode == self.DETAIL:
                self.mode = self.LIST
                self.status = ""
                return True
            return False
        if key == "/" and self.mode == self.LIST:
            self.typing_filter = True
            self.filter = ""
            return True
        if key in ("j", "DOWN"):
            self._move(1)
        elif key in ("k", "UP"):
            self._move(-1)
        elif key in ("\n", "l", "RIGHT") and self.mode == self.LIST:
            name = self.selected()
            if name is not None:
                self.mode = self.DETAIL
                self.detail_name = name
                self.detail_cursor = 0
                self.status = ""
        elif key in ("h", "LEFT") and self.mode == self.DETAIL:
            self.mode = self.LIST
            self.status = ""
        elif key == "r" and self.mode == self.DETAIL:
            self._replay_selected()
        elif key == "g":
            if self.mode == self.LIST:
                self.cursor = 0
            else:
                self.detail_cursor = 0
        return True

    def _move(self, d: int) -> None:
        if self.mode == self.LIST:
            n = len(self.rows())
            if n:
                self.cursor = max(0, min(n - 1, self.cursor + d))
        else:
            n = len(self.versions())
            if n:
                self.detail_cursor = max(0, min(n - 1, self.detail_cursor + d))

    def _replay_selected(self) -> None:
        vs = self.versions()
        if not vs:
            return
        v = vs[min(self.detail_cursor, len(vs) - 1)]
        key = (self.detail_name, v["hash"])
        if key not in self._replay_cache:
            try:
                self._replay_cache[key] = self._replay_fn(
                    self.detail_name, v["hash"]
                )
            except Exception as exc:  # surfaced, never crashes the TUI
                self._replay_cache[key] = {"match": None, "error": str(exc)}
        rep = self._replay_cache[key]
        if rep.get("error"):
            self.status = f"replay error: {rep['error']}"
        elif rep["match"]:
            self.status = f"replay {v['hash'][:10]}: MATCH"
        else:
            self.status = (
                f"replay {v['hash'][:10]}: DRIFT ({', '.join(rep['drift'])})"
            )

    # ----------------------------------------------------------- render

    def render_lines(self, width: int = 80, height: int = 24) -> List[str]:
        """Plain-text frame (also what the curses loop paints)."""
        lines = []
        if self.mode == self.LIST:
            head = f" catalog {self.root}  [{len(self.rows())} entries]"
            if self.filter:
                head += f"  filter:/{self.filter}"
            lines.append(head[:width])
            lines.append("-" * min(width, 60))
            for i, (name, h) in enumerate(self.rows()[: height - 4]):
                mark = ">" if i == self.cursor else " "
                lines.append(f"{mark} {name:<40.40s} {h[:12]}"[:width])
            lines.append("")
            lines.append(
                "[j/k] move  [enter] detail  [/] filter  [q] quit"[:width]
            )
        else:
            lines.append(f" entry {self.detail_name}"[:width])
            lines.append("-" * min(width, 60))
            for i, v in enumerate(self.versions()[: height - 5]):
                mark = ">" if i == self.detail_cursor else " "
                fp = v.get("fingerprint") or {}
                snap = (
                    f"rows={fp['rows']}" if fp.get("rows") is not None else
                    "no-snapshot"
                )
                lines.append(
                    f"{mark} {v['hash'][:12]}  {_fmt_ts(v.get('added_at'))}  "
                    f"{snap}"[:width]
                )
            lines.append("")
            if self.status:
                lines.append(self.status[:width])
            lines.append(
                "[j/k] move  [r] replay  [h/q] back"[:width]
            )
        return lines


def run_tui(root: Optional[str] = None) -> int:
    """Curses loop over TuiModel. Requires a real TTY."""
    import os
    import sys

    if not (sys.stdout.isatty() and sys.stdin.isatty()):
        raise RuntimeError(
            "catalog tui needs an interactive terminal; use "
            "`xorq-spark catalog ls/history/replay` in scripts"
        )
    import curses

    model = TuiModel(root)

    def loop(stdscr):
        curses.curs_set(0)
        stdscr.keypad(True)
        while True:
            stdscr.erase()
            h, w = stdscr.getmaxyx()
            for y, line in enumerate(model.render_lines(w - 1, h)):
                if y >= h:
                    break
                stdscr.addnstr(y, 0, line, w - 1)
            stdscr.refresh()
            c = stdscr.getch()
            key = {
                curses.KEY_DOWN: "DOWN",
                curses.KEY_UP: "UP",
                curses.KEY_LEFT: "LEFT",
                curses.KEY_RIGHT: "RIGHT",
                curses.KEY_BACKSPACE: "BACKSPACE",
                27: "ESC",
                10: "\n",
            }.get(c)
            if key is None:
                try:
                    key = chr(c)
                except ValueError:
                    continue
            if not model.handle_key(key):
                return 0

    return curses.wrapper(loop)
