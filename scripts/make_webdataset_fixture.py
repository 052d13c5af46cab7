"""Write the committed golden WebDataset shards from the GOLDEN layout
constant — run once; tests pin the bytes against build_tar so drift is
impossible without failing the suite."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from amadeus_spark.sources import wds_golden as G
from amadeus_spark.sources.webdataset import build_tar


def main() -> None:
    os.makedirs(G.fixture_dir(), exist_ok=True)
    for shard in G.GOLDEN:
        path = os.path.join(G.fixture_dir(), shard)
        with open(path, "wb") as f:
            f.write(build_tar(G.members(shard)))
        print(path, os.path.getsize(path))


if __name__ == "__main__":
    main()
