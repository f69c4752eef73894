"""Tile-grid and vision-token arithmetic vs hand-computed cases
(BASELINE.md cost-model section; deepseek_ocr.py:61-106)."""

from sparkocr.textproc import tiles


def test_mode_token_budgets_match_readme():
    # README.md:215-223 — published per-page token budgets + 1 separator.
    # h=w=ceil((size//16)/4): 512→8, 640→10, 1024→16, 1280→20
    assert tiles.num_image_tokens(500, 500, 512, 512, False) == 8 * 9 + 1  # Tiny 64(+9)
    assert tiles.num_image_tokens(500, 500, 640, 640, False) == 10 * 11 + 1
    assert tiles.num_image_tokens(500, 500, 1024, 1024, False) == 16 * 17 + 1
    assert tiles.num_image_tokens(500, 500, 1280, 1280, False) == 20 * 21 + 1


def test_gundam_small_image_guard():
    # <=640 in both dims → 1x1 grid → no local tokens (deepseek_ocr.py:79-81)
    assert tiles.num_image_tokens_mode(640, 640, "gundam") == 16 * 17 + 1


def test_gundam_tiled_formula():
    # BASELINE.md example: 2x3 tiles → 272 + (3*10)*(2*10+1) + 1 = 903
    w, h = 1280, 1920  # aspect 2:3 → grid (2,3)
    grid = tiles.count_tiles(w, h, image_size=640)
    assert grid == (2, 3)
    assert tiles.num_image_tokens_mode(w, h, "gundam") == 16 * 17 + 30 * 21 + 1 == 903


def test_count_tiles_square_and_wide():
    assert tiles.count_tiles(1000, 1000) in {(1, 2), (2, 1), (2, 2), (1, 1)}
    i, j = tiles.count_tiles(3000, 1000)
    assert i > j  # wide image → more horizontal tiles
    i2, j2 = tiles.count_tiles(1000, 3000)
    assert j2 > i2


def test_tile_grid_bounds():
    for w, h in [(100, 100), (5000, 300), (641, 641), (1275, 1650), (99, 4000)]:
        i, j = tiles.count_tiles(w, h)
        assert 1 <= i * j <= tiles.MAX_CROPS
