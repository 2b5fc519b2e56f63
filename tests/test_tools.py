"""CLI tools tests: convert + info."""

import numpy as np

from pasture_tpu.io import read_all
from pasture_tpu.layout import attributes as att


def test_convert_las_to_laz_to_pnts(tmp_path, reference_test_data):
    from pasture_tpu.tools.convert import main
    src = f"{reference_test_data}/10_points_format_3.las"
    laz = tmp_path / "x.laz"
    pnts = tmp_path / "x.pnts"
    assert main([src, str(laz)]) == 0
    assert main([str(laz), str(pnts), "--attributes", "Position3D",
                 "ColorRGB"]) == 0
    back = read_all(pnts)
    assert len(back) == 10
    np.testing.assert_allclose(back.get(att.POSITION_3D.name)[:, 0],
                               np.arange(10.0), atol=1e-4)


def test_convert_ascii_to_las(tmp_path, reference_test_data):
    from pasture_tpu.tools.convert import main
    out = tmp_path / "a.las"
    assert main([f"{reference_test_data}/10_points_ascii.txt", str(out),
                 "--ascii-format", "xyzieRGB"]) == 0
    back = read_all(out)
    np.testing.assert_allclose(back.get(att.POSITION_3D.name)[:, 0],
                               np.arange(10.0), atol=1e-3)


def test_info_on_pnts(reference_test_data, capsys):
    from pasture_tpu.tools.info import main
    assert main([f"{reference_test_data}/points.pnts"]) == 0
    out = capsys.readouterr().out
    assert "Position3D" in out
