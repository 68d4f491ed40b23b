

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


def test_utf8_codepoints_matches_python_ord():
    """The vectorized UTF-8 decoder agrees with python ord() across 1-4
    byte sequences, empty strings, and sliced arrays."""
    import numpy as np
    import pyarrow as pa

    from sievedata.functions.text import utf8_codepoints

    texts = ["hello", "héllo wörld", "漢字テスト", "a😀b", "", "ü", "𐍈𐍈x"]
    arr = pa.array(texts, pa.string())
    parent, cp, n = utf8_codepoints(arr)
    want_parent, want_cp = [], []
    for i, t in enumerate(texts):
        for ch in t:
            want_parent.append(i)
            want_cp.append(ord(ch))
    assert cp.tolist() == want_cp
    assert parent.tolist() == want_parent
    assert n.tolist() == [len(t) for t in texts]

    sliced = arr.slice(2)  # non-zero offset
    p2, c2, n2 = utf8_codepoints(sliced)
    assert c2.tolist() == [ord(ch) for t in texts[2:] for ch in t]
    assert n2.tolist() == [len(t) for t in texts[2:]]
