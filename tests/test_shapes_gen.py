"""Synthetic SHAPES generator tests: determinism, label consistency with
the module semantics, file-format compatibility with the loader."""

import os

import numpy as np
import pytest

from n2nmn_tpu.data.builders import shapes_gen
from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.data.shapes import load_shapes_split

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REAL_ROOT = os.path.join(REPO, "exp_shapes")


@pytest.fixture(scope="module")
def bank():
    files = [os.path.join(REAL_ROOT, "shapes_dataset",
                          "train.tiny.input.npy")]
    return shapes_gen.extract_sprite_bank(files)


def test_sprite_bank_covers_classes(bank):
    sprites, occupancy = bank
    # tiny split alone covers several of the 9 (color, shape) classes
    assert len(sprites) >= 5
    for (color, shape), cells in sprites.items():
        assert color in shapes_gen.COLORS and shape in shapes_gen.SHAPES
        for cell in cells[:3]:
            assert shapes_gen.classify_cell(cell) == (color, shape)
    assert abs(occupancy.sum() - 1.0) < 1e-9


def test_generated_labels_match_semantics(bank):
    sprites, occupancy = bank
    rng = np.random.RandomState(0)
    for _ in range(50):
        parse, sexpr, qstr = shapes_gen.sample_question(rng)
        img, grid = shapes_gen.sample_scene(rng, sprites, occupancy)
        label = shapes_gen.eval_query(grid, parse)
        # re-extract the scene from the rendered image: classification
        # roundtrip must preserve the label
        grid2 = [[shapes_gen.classify_cell(
            img[a * 10:(a + 1) * 10, b * 10:(b + 1) * 10])
            for b in range(3)] for a in range(3)]
        assert grid2 == [[g for g in row] for row in grid]
        assert shapes_gen.eval_query(grid2, parse) == label


def test_write_split_loader_roundtrip(tmp_path, bank):
    sprites, occupancy = bank
    rng = np.random.RandomState(1)
    images, sexprs, qstrs, labels = shapes_gen.generate_split(
        rng, sprites, occupancy, num_questions=128)
    shapes_gen.write_split(str(tmp_path), "val", images, sexprs, qstrs,
                           labels)
    import shutil
    for f in ("vocabulary_shape.txt", "vocabulary_layout.txt"):
        shutil.copy(os.path.join(REAL_ROOT, "data", f),
                    str(tmp_path / "data" / f))
    np.save(str(tmp_path / "data" / "image_mean.npy"),
            np.zeros((30, 30, 3)))
    grammar = ModuleGrammar.from_vocab_file(
        str(tmp_path / "data" / "vocabulary_layout.txt"))
    data = load_shapes_split(
        str(tmp_path), ["val"],
        str(tmp_path / "data" / "vocabulary_shape.txt"),
        grammar, 15, 11)
    assert data.num_questions == 128
    np.testing.assert_array_equal(data.labels,
                                  np.array(labels, np.int32))
    # every generated layout is grammar-valid
    from n2nmn_tpu.layout.assembler import Assembler, INVALID_EXPR
    asm = Assembler(grammar)
    _, validity = asm.assemble(data.gt_layout)
    assert np.all(validity)
