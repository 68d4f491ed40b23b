

def test_langid_batch_matches_scalar_reference():
    """The vectorized __call__ must agree with the per-row classify() on
    every doc, including empty/None text and tie cases."""
    import pyarrow as pa

    from sievedata.functions.text import LangId

    li = LangId()
    texts = [
        "the cat sat on the mat and it was good",
        "der hund und die katze ist ein tier",
        "le chat et la souris dans un jardin",
        "el perro y el gato en la casa es",
        None,
        "",
        "zzz qqq xxx",                      # no stopword hits -> und
        "the der le el",                    # 1 hit each -> first lang (de? en?) by scalar rule
        "' '' '''",
    ]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    got = li(batch)["lang_pred"].to_pylist()
    want = [li.classify(t or "") for t in texts]
    assert got == want
