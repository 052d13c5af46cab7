"""Write fixtures/pg_copy_golden.bin — the committed COPY BINARY golden
stream the postgres_copy_decode gate query decodes (see
sources/pg_golden.py; a test pins fixture bytes == this encoding)."""

from amadeus_spark.sources import pg_golden as G

if __name__ == "__main__":
    path = G.golden_fixture_path()
    with open(path, "wb") as f:
        f.write(G.encode_copy_binary(G.GOLDEN_ROWS, G.GOLDEN_SCHEMA))
    print(path)
