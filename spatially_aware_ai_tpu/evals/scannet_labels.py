"""ScanNet open-vocabulary evaluation label sets.

labels20/prompts20/colors20 and labels200/prompts200 reproduce the
reference's lists exactly (eval_scannet_segmentation.py:18-490) — these
define the benchmark and must match for score parity. colors200 (used only
for debug PLY visualization) is a deterministic generated palette.
"""
from __future__ import annotations

import colorsys

import numpy as np

labels20 = [
    "wall", "floor", "cabinet", "bed", "chair", "couch", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "furniture",
]

prompts20 = [
    label if label == "other" else f"a picture of a {label}"
    for label in labels20
]
prompts20[5] = prompts20[5].replace("couch", "sofa")

colors20 = (
    np.array(
        [
            (174, 199, 232), (152, 223, 138), (31, 119, 180), (255, 187, 120),
            (188, 189, 34), (140, 86, 75), (255, 152, 150), (214, 39, 40),
            (197, 176, 213), (148, 103, 189), (196, 156, 148), (23, 190, 207),
            (247, 182, 210), (219, 219, 141), (255, 127, 14), (158, 218, 229),
            (44, 160, 44), (112, 128, 144), (227, 119, 194), (82, 84, 163),
        ]
    ).astype(np.float32)
    / 255
)

labels200 = [
    "wall", "chair", "floor", "table", "door", "couch", "cabinet", "shelf",
    "desk", "office chair", "bed", "pillow", "sink", "picture", "window",
    "toilet", "bookshelf", "monitor", "curtain", "book", "armchair",
    "coffee table", "box", "refrigerator", "lamp", "kitchen cabinets",
    "towel", "clothes", "tv", "nightstand", "counter", "dresser", "stool",
    "cushion", "plant", "ceiling", "bathtub", "end table", "dining table",
    "keyboard", "bag", "backpack", "toilet paper", "printer", "tv stand",
    "whiteboard", "blanket", "shower curtain", "trash can", "closet",
    "stairs", "microwave", "stove", "shoes", "computer tower", "bottle",
    "bin", "ottoman", "bench", "board", "washing machine", "mirror",
    "copier", "basket", "sofa chair", "file cabinet", "fan", "laptop",
    "shower", "paper", "person", "paper towel dispenser", "oven", "blinds",
    "rack", "plate", "blackboard", "piano", "suitcase", "rail", "radiator",
    "recycling bin", "container", "wardrobe", "soap dispenser", "telephone",
    "bucket", "clock", "stand", "light", "laundry basket", "pipe",
    "clothes dryer", "guitar", "toilet paper holder", "seat", "speaker",
    "column", "bicycle", "ladder", "bathroom stall", "shower wall", "cup",
    "jacket", "storage bin", "coffee maker", "dishwasher",
    "paper towel roll", "machine", "mat", "windowsill", "bar", "toaster",
    "bulletin board", "ironing board", "fireplace", "soap dish",
    "kitchen counter", "doorframe", "toilet paper dispenser", "mini fridge",
    "fire extinguisher", "ball", "hat", "shower curtain rod", "water cooler",
    "paper cutter", "tray", "shower door", "pillar", "ledge", "toaster oven",
    "mouse", "toilet seat cover dispenser", "furniture", "cart",
    "storage container", "scale", "tissue box", "light switch", "crate",
    "power outlet", "decoration", "sign", "projector", "closet door",
    "vacuum cleaner", "candle", "plunger", "stuffed animal", "headphones",
    "dish rack", "broom", "guitar case", "range hood", "dustpan",
    "hair dryer", "water bottle", "handicap bar", "purse", "vent",
    "shower floor", "water pitcher", "mailbox", "bowl", "paper bag",
    "alarm clock", "music stand", "projector screen", "divider",
    "laundry detergent", "bathroom counter", "object", "bathroom vanity",
    "closet wall", "laundry hamper", "bathroom stall door", "ceiling light",
    "trash bin", "dumbbell", "stair rail", "tube", "bathroom cabinet",
    "cd case", "closet rod", "coffee kettle", "structure", "shower head",
    "keyboard piano", "case of water bottles", "coat rack",
    "storage organizer", "folded chair", "fire alarm", "power strip",
    "calendar", "poster", "potted plant", "luggage", "mattress",
]
assert len(labels200) == 200

prompts200 = labels200.copy()
prompts200[5] = "sofa"


def _palette(n: int) -> np.ndarray:
    cols = []
    for i in range(n):
        h = (i * 0.61803398875) % 1.0
        s = 0.55 + 0.45 * ((i * 7) % 3) / 2.0
        v = 0.6 + 0.4 * ((i * 5) % 3) / 2.0
        cols.append(colorsys.hsv_to_rgb(h, s, v))
    return np.asarray(cols, np.float32)


colors200 = _palette(200)
