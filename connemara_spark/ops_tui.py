"""Interactive stuck-DDL fixer — the curses TUI over ``ops.Fixer``.

The reference ships an interactive repair console
(``replayer/connemara_fixer.pl:1-280``): a three-pane Curses::UI screen
(metadata | original query | EDITABLE rewritten query) with C-E
execute-and-advance, C-R refresh, C-Q quit, plus a staleness check — if
the head-of-queue record changed between display and execute, it bails
("something is fishy", :166-178). This module reproduces that surface on
stdlib ``curses``:

- :class:`FixerTuiSession` — ALL the behavior, curses-free and
  test-driven: load the head stuck DDL into a view-model, verify the head
  is unchanged before executing the (possibly edited) statement, skip,
  quit. The staleness contract matches the reference: database, LSN,
  search_path and query text must all be identical or execute refuses.
- :func:`run_curses` — the thin rendering/keybinding layer
  (``curses.textpad`` editor; C-E execute, C-R refresh, C-S skip,
  C-Q/C-C quit). Nothing in it makes decisions.

Run: ``python -m connemara_spark.ops_tui SPOOL CATALOG_JSON STORE_DIR``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from connemara_spark.ddl.rewriter import fix_search_path
from connemara_spark.ops import Fixer, StuckDDL


class StaleQueryError(RuntimeError):
    """The head-of-queue record changed between display and execute —
    the reference's 'something is fishy' bailout (connemara_fixer.pl:
    166-178). The caller must refresh and re-inspect."""


@dataclass
class FixerView:
    """What the screen shows for one stuck DDL."""

    meta: str
    original: str
    editable: str


class FixerTuiSession:
    """The fixer TUI's behavior, with the terminal abstracted away."""

    def __init__(self, fixer: Fixer):
        self.fixer = fixer
        self.current: StuckDDL | None = None

    def refresh(self) -> FixerView | None:
        """Load the next stuck DDL (fixer fetch, connemara_fixer.pl:
        89-127). None = nothing pending (the 'no query to replay'
        dialog)."""
        self.current = self.fixer.head()
        if self.current is None:
            return None
        s = self.current
        # the reference prefixes the ORIGINAL pane with the fixed
        # search_path (connemara_fixer.pl:144-147)
        sp = fix_search_path(s.search_path or "public", s.database)
        original = f"SET search_path TO {sp}, public;\n{s.query}\n"
        meta = (
            f"search_path: [{s.search_path}]\n======\n"
            f"database: {s.database}\n======\n"
            f"lsn: {s.lsn_start}\n======\n"
            f"at: {s.insert_timestamp}"
        )
        return FixerView(meta=meta, original=original, editable=s.query)

    def _verify_unchanged(self) -> None:
        cur = self.fixer.head()
        old = self.current
        if (
            cur is None
            or old is None
            or cur.database != old.database
            or cur.lsn_start != old.lsn_start
            or (cur.search_path or "") != (old.search_path or "")
            or cur.query != old.query
        ):
            raise StaleQueryError(
                "the query to replay has changed in the spool — refusing to "
                "execute against a different head (refresh and re-inspect)"
            )

    def execute(self, edited_query: str) -> str:
        """Verify-unchanged, then execute the edited statement and advance
        past the stuck event (the atomic execute+delete,
        connemara_fixer.pl:161-188). Returns the executor's action tag."""
        if self.current is None:
            raise RuntimeError("nothing loaded — refresh first")
        self._verify_unchanged()
        tag = self.fixer.apply_edited(self.current, edited_query)
        self.current = None
        return tag

    def skip(self) -> None:
        """Advance past the stuck event without executing (the CLI
        --skip outcome; the reference models this as deleting the spool
        row after a no-op edit)."""
        if self.current is None:
            raise RuntimeError("nothing loaded — refresh first")
        self._verify_unchanged()
        self.fixer.skip(self.current)
        self.current = None


HELP = "C-E: execute+next   C-S: skip   C-R: refresh   C-Q: quit"


def run_curses(session: FixerTuiSession) -> None:  # pragma: no cover — terminal
    """Three-pane curses screen mirroring the reference layout: meta (left)
    | original (right), editable rewritten query below, help line at the
    bottom. Decisions all live in FixerTuiSession."""
    import curses
    import curses.textpad

    def draw(stdscr, view, status=""):
        stdscr.clear()
        h, w = stdscr.getmaxyx()
        meta_w = max(24, w // 4)
        for i, line in enumerate(view.meta.split("\n")[: h // 2 - 1]):
            stdscr.addnstr(i, 0, line, meta_w - 1)
        for i, line in enumerate(view.original.split("\n")[: h // 2 - 1]):
            stdscr.addnstr(i, meta_w + 1, line, w - meta_w - 2)
        stdscr.hline(h // 2 - 1, 0, "-", w)
        stdscr.addnstr(h - 1, 0, f"{HELP}   {status}", w - 1)
        stdscr.refresh()
        return curses.newwin(h // 2 - 2, w - 2, h // 2, 1)

    def main(stdscr):
        curses.raw()
        status = ""
        while True:
            view = session.refresh()
            if view is None:
                stdscr.clear()
                stdscr.addstr(0, 0, "no query to replay — C-R retry, C-Q quit")
                stdscr.refresh()
                ch = stdscr.getch()
                if ch in (17, 3):  # C-Q / C-C
                    return
                continue
            editor_win = draw(stdscr, view, status)
            editor_win.addstr(0, 0, view.editable)
            box = curses.textpad.Textbox(editor_win)

            action = {}

            def dispatch(ch):
                if ch in (5, 19, 18, 17, 3):  # C-E, C-S, C-R, C-Q, C-C
                    action["ch"] = ch
                    return 7  # Ctrl-G terminates the Textbox edit loop
                return ch

            edited = box.edit(dispatch)
            ch = action.get("ch")
            if ch in (17, 3):
                return
            if ch == 18:
                status = "refreshed"
                continue
            try:
                if ch == 19:
                    session.skip()
                    status = "skipped"
                elif ch == 5:
                    tag = session.execute(edited.strip())
                    status = f"executed: {tag}"
            except StaleQueryError as e:
                status = f"STALE: {e}"

    curses.wrapper(main)


def tui_main(argv: list[str] | None = None) -> int:  # pragma: no cover — terminal
    import argparse
    import json

    from connemara_spark.catalog import EngineCatalog
    from connemara_spark.pipeline import ParquetStore, Replayer
    from connemara_spark.session import get_spark
    from connemara_spark.streaming.driver import LsnWatermark

    ap = argparse.ArgumentParser(prog="connemara-fixer-tui", description=__doc__)
    ap.add_argument("spool_dir")
    ap.add_argument("catalog_json")
    ap.add_argument("store_dir")
    ap.add_argument("--watermark", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("connemara-fixer-tui")
    with open(args.catalog_json) as fh:
        catalog = EngineCatalog.from_json(fh.read())
    store = ParquetStore(spark, args.store_dir)
    wm = LsnWatermark(args.watermark or os.path.join(args.store_dir, "lsn_watermark.json"))
    session = FixerTuiSession(Fixer(spark, Replayer(spark, catalog, store), wm, args.spool_dir))
    run_curses(session)
    return 0


if __name__ == "__main__":
    raise SystemExit(tui_main())
