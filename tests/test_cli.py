from __future__ import annotations

import os

from datalake_on_prem_system_spark.cli import main


def test_cli_ingest_read_crud_history(spark, tmp_path, capsys):
    csv = tmp_path / "in.csv"
    csv.write_text("id,name,price\n1,alpha,10.5\n2,beta,20.5\n")
    wh = str(tmp_path / "wh")

    assert main(["--warehouse", wh, "ingest", str(csv), "items"]) == 0
    assert "ingested 2 rows" in capsys.readouterr().out

    assert main(["--warehouse", wh, "tables"]) == 0
    assert "items" in capsys.readouterr().out

    assert main(["--warehouse", wh, "insert", "items", "id=3", "name=gamma", "price=30.5"]) == 0
    assert main(["--warehouse", wh, "update", "items", "1", "price=11.5"]) == 0
    assert main(["--warehouse", wh, "delete", "items", "2"]) == 0
    capsys.readouterr()

    assert main(["--warehouse", wh, "read", "items", "--columns", "id,price"]) == 0
    out = capsys.readouterr().out
    assert "11.5" in out and "30.5" in out and "20.5" not in out

    assert main(["--warehouse", wh, "history", "items"]) == 0
    out = capsys.readouterr().out
    for op in ("create_or_replace", "insert", "update", "delete"):
        assert op in out

    assert main(["--warehouse", wh, "travel", "items", "0"]) == 0
    assert "beta" in capsys.readouterr().out

    assert main(["--warehouse", wh, "diff", "items", "0", "3"]) == 0
    out = capsys.readouterr().out
    assert "MODIFIED" in out or "NEW" in out

    assert main(["--warehouse", wh, "sql", "SELECT count(*) AS n FROM items;"]) == 0
    assert main(["--warehouse", wh, "search", "items", "gamma"]) == 0
    assert "gamma" in capsys.readouterr().out
