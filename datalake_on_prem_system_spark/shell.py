"""Interactive shell — mirrors the reference's ``lake_shell.py`` (cmd-based
REPL with verbs tables/select/get/insert/update/delete/sql/history/travel/
diff/search/load_csv) against the local engine.

    python -m datalake_on_prem_system_spark.shell [--warehouse DIR]
"""

from __future__ import annotations

import cmd
import os
import shlex
import sys


class LakeShell(cmd.Cmd):
    intro = "lake shell — type help or ? to list commands"
    prompt = "lake> "

    def __init__(self, warehouse: str):
        super().__init__()
        from .engine import LakeEngine
        from .session import get_spark

        self.eng = LakeEngine(get_spark(app_name="lake_shell"), warehouse)

    # every verb prints and never raises out of the loop — onecmd catches
    # argument-parse errors (int()/kv splits) too, not just engine calls
    def onecmd(self, line: str) -> bool:
        try:
            return super().onecmd(line)
        except Exception as exc:  # noqa: BLE001 — REPL surface
            print(f"error: {exc}")
            return False

    def emptyline(self) -> bool:
        # cmd.Cmd's default re-executes the LAST command on a blank line —
        # a stray Enter must never repeat an insert/update/delete
        return False

    def _safe(self, fn, *a, **kw):
        try:
            return fn(*a, **kw)
        except Exception as exc:  # noqa: BLE001 — REPL surface
            print(f"error: {exc}")
            return None

    def do_tables(self, _arg: str) -> None:
        """tables — list tables"""
        for t in self._safe(self.eng.list_tables) or []:
            print(t)

    def do_select(self, arg: str) -> None:
        """select <table> [limit] — latest-first page"""
        parts = shlex.split(arg)
        if not parts:
            return print("usage: select <table> [limit]")
        limit = int(parts[1]) if len(parts) > 1 else 20
        df = self._safe(self.eng.read, parts[0], limit=limit)
        df is not None and df.show(limit, truncate=False)

    def do_get(self, arg: str) -> None:
        """get <table> <pk> — point lookup"""
        parts = shlex.split(arg)
        if len(parts) != 2:
            return print("usage: get <table> <pk>")
        t, pk_val = parts
        pk = self._safe(self.eng.id_col, t)
        if pk is None:  # the first error already printed; don't stack a second
            return
        df = self._safe(self.eng.read, t, filter_col=pk, filter_val=pk_val)
        df is not None and df.show(truncate=False)

    def do_insert(self, arg: str) -> None:
        """insert <table> col=val [col=val ...]"""
        parts = shlex.split(arg)
        if len(parts) < 2:
            return print("usage: insert <table> col=val ...")
        from .cli import _kv

        self._safe(self.eng.insert, parts[0], _kv(parts[1:]))

    def do_update(self, arg: str) -> None:
        """update <table> <pk> col=val [col=val ...]"""
        parts = shlex.split(arg)
        if len(parts) < 3:
            return print("usage: update <table> <pk> col=val ...")
        from .cli import _kv

        self._safe(self.eng.update, parts[0], parts[1], _kv(parts[2:]))

    def do_delete(self, arg: str) -> None:
        """delete <table> <pk>"""
        parts = shlex.split(arg)
        if len(parts) != 2:
            return print("usage: delete <table> <pk>")
        self._safe(self.eng.delete, parts[0], parts[1])

    def do_sql(self, arg: str) -> None:
        """sql <query> — SQL passthrough over engine tables"""
        df = self._safe(self.eng.query, arg)
        df is not None and df.show(50, truncate=False)

    def do_history(self, arg: str) -> None:
        """history <table> — commit history"""
        df = self._safe(self.eng.history, arg.strip())
        df is not None and df.show(truncate=False)

    def do_travel(self, arg: str) -> None:
        """travel <table> <version-or-tag> — time travel read"""
        parts = shlex.split(arg)
        if len(parts) != 2:
            return print("usage: travel <table> <version-or-tag>")
        # pass the raw token: time_travel resolves digit strings as
        # versions and anything else as a tag name
        df = self._safe(self.eng.time_travel, parts[0], parts[1])
        df is not None and df.show(20, truncate=False)

    def do_diff(self, arg: str) -> None:
        """diff <table> <v_old> <v_new> — snapshot diff"""
        parts = shlex.split(arg)
        if len(parts) != 3:
            return print("usage: diff <table> <v_old> <v_new>")
        df = self._safe(self.eng.diff, parts[0], int(parts[1]), int(parts[2]))
        df is not None and df.show(50, truncate=False)

    def do_search(self, arg: str) -> None:
        """search <table> <query words>"""
        parts = shlex.split(arg)
        if len(parts) < 2:
            return print("usage: search <table> <query>")
        df = self._safe(self.eng.search, parts[0], " ".join(parts[1:]))
        df is not None and df.show(20, truncate=False)

    def do_load_csv(self, arg: str) -> None:
        """load_csv <path> <table> [mode] — ingest a CSV"""
        parts = shlex.split(arg)
        if len(parts) < 2:
            return print("usage: load_csv <path> <table> [create|append|upsert]")
        mode = parts[2] if len(parts) > 2 else "create"
        df = self._safe(self.eng.ingest_csv, parts[1], parts[0], mode=mode)
        df is not None and print(f"ingested; table now has {df.count()} rows")

    def do_exit(self, _arg: str) -> bool:
        """exit the shell"""
        return True

    do_quit = do_EOF = do_exit


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="lake-shell")
    ap.add_argument("--warehouse", default=os.environ.get("LAKE_WAREHOUSE", "./warehouse"))
    args = ap.parse_args(argv)
    LakeShell(args.warehouse).cmdloop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
