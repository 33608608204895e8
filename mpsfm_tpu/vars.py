"""Benchmark scene lists (reference: mpsfm/vars/gvars.py) — the paper's
evaluation sets, kept for parity harnesses."""

ETH3D_TRAIN_SCENES = [
    "courtyard", "delivery_area", "electro", "facade", "kicker", "meadow",
    "office", "pipes", "playground", "relief", "relief_2", "terrace", "terrains",
]
ETH3D_TEST_SCENES = [
    "botanical_garden", "boulders", "bridge", "door", "exhibition_hall",
    "lecture_room", "living_room", "lounge", "observatory", "old_computer", "statue",
]
ETH3D_SCENES = ETH3D_TRAIN_SCENES + ETH3D_TEST_SCENES

SMERF_SCENES = ["zipnerf/alameda", "zipnerf/berlin", "zipnerf/london", "zipnerf/nyc"]
