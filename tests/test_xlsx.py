"""Stdlib xlsx writer (reference exports metrics to Excel per eval tick)."""
import os
import zipfile

from cglgan_tpu.utils.logging import RunDir
from cglgan_tpu.utils.xlsx import write_xlsx


class TestXlsx:
    def test_structure_and_content(self, tmp_path):
        p = str(tmp_path / "m.xlsx")
        write_xlsx(p, [{"round": 1, "kl": 0.53, "note": "a<b&c"},
                       {"round": 2, "kl": 0.41, "extra": True}])
        z = zipfile.ZipFile(p)
        names = set(z.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml",
                "xl/worksheets/sheet1.xml"} <= names
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
        assert "<v>0.53</v>" in sheet
        assert "a&lt;b&amp;c" in sheet          # XML-escaped strings
        assert 'r="3"' in sheet                  # 1 header + 2 data rows
        # union of fields across records appears in the header
        assert "extra" in sheet

    def test_rundir_writes_xlsx(self, tmp_path):
        rd = RunDir(str(tmp_path), "r1")
        rd.log({"round": 1, "kl": 0.9})
        rd.log({"round": 2, "kl": 0.7})
        rd.close()
        assert os.path.exists(rd.file("metrics.xlsx"))
        z = zipfile.ZipFile(rd.file("metrics.xlsx"))
        assert "<v>0.7</v>" in z.read("xl/worksheets/sheet1.xml").decode()
