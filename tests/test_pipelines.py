import numpy as np
import pytest

from advancedliteratemachinery_tpu.pipelines.document import (
    DocumentStructurization,
    GeneralTextReading,
    TableParsing,
    cells_to_html,
    sort_reading_order,
)
from advancedliteratemachinery_tpu.pipelines.modules import (
    LayoutAnalysis,
    TableStructureRecognition,
    TextDetection,
    TextRecognition,
    crop_image,
    order_point,
)


def fake_detector(image):
    # two text lines: top-left and bottom-right
    quads = np.asarray([
        [10, 10, 60, 10, 60, 25, 10, 25],
        [10, 60, 80, 60, 80, 76, 10, 76],
    ], np.float32)
    return quads, np.asarray([0.9, 0.8], np.float32)


def fake_recognizer(batch):
    # returns per-crop (text, conf, head)
    return [(f"text{i}", 0.9, "char") for i in range(len(batch))]


def fake_layout(image):
    quads = np.asarray([
        [0, 0, 100, 0, 100, 40, 0, 40],     # region containing line 1
        [0, 50, 100, 50, 100, 100, 0, 100], # region containing line 2
    ], np.float32)
    return quads, np.asarray([0.95, 0.9]), np.asarray([2, 7])  # text, table


class TestModules:
    def test_order_point_clockwise(self):
        pts = order_point([60, 10, 10, 10, 10, 25, 60, 25])
        np.testing.assert_allclose(pts[0], [10, 10])
        np.testing.assert_allclose(pts[1], [60, 10])
        np.testing.assert_allclose(pts[2], [60, 25])

    def test_crop_image_shape(self):
        img = np.zeros((100, 100, 3), np.uint8)
        img[10:25, 10:60] = 255
        crop = crop_image(img, np.asarray([[10, 10], [60, 10], [60, 25], [10, 25]],
                                          np.float32))
        assert crop.shape[0] == 15 and crop.shape[1] == 50
        assert crop.mean() > 200

    def test_text_detection_output(self):
        det = TextDetection(fake_detector)(np.zeros((100, 100, 3), np.uint8))
        assert det["polygons"].shape == (2, 8)

    def test_recognition_batches(self):
        det = TextDetection(fake_detector)(np.zeros((100, 100, 3), np.uint8))
        rec = TextRecognition(fake_recognizer, batch_size=1)(
            np.zeros((100, 100, 3), np.uint8), det)
        assert rec["texts"] == ["text0", "text0"]  # one per batch of 1


class TestPipelines:
    def test_general_text_reading(self):
        p = GeneralTextReading(TextDetection(fake_detector),
                               TextRecognition(fake_recognizer))
        out = p(np.zeros((100, 100, 3), np.uint8))
        assert len(out["instances"]) == 2
        assert out["instances"][0]["text"].startswith("text")

    def test_document_structurization_assigns_by_region(self):
        p = DocumentStructurization(LayoutAnalysis(fake_layout),
                                    TextDetection(fake_detector),
                                    TextRecognition(fake_recognizer))
        out = p(np.zeros((100, 100, 3), np.uint8))
        assert len(out) == 2
        # each region got exactly its own line
        assert len(out[0]["text_list"]) == 1
        assert len(out[1]["text_list"]) == 1
        assert out[0]["category_name"] == "plain text"
        assert out[1]["category_name"] == "table"

    def test_reading_order(self):
        items = [
            {"region_poly": [0, 50, 10, 50, 10, 60, 0, 60]},
            {"region_poly": [50, 0, 60, 0, 60, 10, 50, 10]},
            {"region_poly": [0, 0, 10, 0, 10, 10, 0, 10]},
        ]
        ordered = sort_reading_order(items)
        cys = [np.asarray(i["region_poly"]).reshape(4, 2).mean(0)[1] for i in ordered]
        assert cys == sorted(cys)
        # same row: left before right
        assert ordered[0]["region_poly"][0] < ordered[1]["region_poly"][0]

    def test_table_parsing_and_html(self):
        def fake_table(image):
            return {"polygons": np.asarray([
                        [0, 0, 50, 0, 50, 40, 0, 40],
                        [50, 0, 100, 0, 100, 40, 50, 40],
                        [0, 40, 100, 40, 100, 100, 0, 100]], np.float32),
                    "logi_coords": np.asarray([[0, 0, 0, 0], [0, 0, 1, 1],
                                               [1, 1, 0, 1]], np.int32)}

        p = TableParsing(TableStructureRecognition(fake_table),
                         TextDetection(fake_detector),
                         TextRecognition(fake_recognizer))
        out = p(np.zeros((100, 100, 3), np.uint8))
        assert len(out["cells"]) == 3
        html = out["html"]
        assert html.startswith("<table>") and html.count("<tr>") == 2
        assert 'colspan="2"' in html  # bottom cell spans both columns

    def test_html_roundtrips_through_teds(self):
        from advancedliteratemachinery_tpu.eval.teds import TEDS

        cells = [{"poly": [], "logi_coord": [0, 0, 0, 0], "content": "a"},
                 {"poly": [], "logi_coord": [0, 0, 1, 1], "content": "b"}]
        html = cells_to_html(cells)
        assert TEDS().evaluate(html, html) == pytest.approx(1.0)
