# Reconstructs the WHATWG named-character-reference table (public spec data)
# from the reference's packed tables into a flat TSV resource:
#   <name-with-optional-semicolon>\t<hex cp>[ <hex cp>]
import re, sys

src = open('/root/reference/HtmlParserSharp/Core/NamedCharacters.cs', encoding='utf-8-sig').read()
acc = open('/root/reference/HtmlParserSharp/Core/NamedCharacterAccel.cs', encoding='utf-8-sig').read()

# --- NAMES ---
m = re.search(r'NAMES\s*=\s*\{(.*?)\};', src, re.S)
names_blob = m.group(1)
names = re.findall(r'"((?:[^"\\]|\\.)*)"', names_blob)
def unesc(s):
    return re.sub(r'\\u([0-9a-fA-F]{4})', lambda g: chr(int(g.group(1),16)), s).replace('\\\\','\\').replace('\\"','"')
names = [unesc(n) for n in names]

# --- VALUES ---
m = re.search(r'VALUES\s*=\s*new char\[\]\[\]\s*\{(.*?)\};', src, re.S)
vals_blob = m.group(1)
arrs = re.findall(r'new char\[\]\s*\{([^}]*)\}', vals_blob)
def parse_char(tok):
    tok = tok.strip()
    assert tok.startswith("'") and tok.endswith("'"), tok
    body = tok[1:-1]
    if body.startswith('\\u'): return chr(int(body[2:],16))
    if body == '\\\\': return '\\'
    if body == "\\'": return "'"
    if body == '\\0': return '\0'
    if body == '\\n': return '\n'
    if body == '\\t': return '\t'
    if body == '\\r': return '\r'
    assert len(body)==1, repr(body)
    return body
values = []
for a in arrs:
    chars = [parse_char(t) for t in re.findall(r"'(?:[^'\\]|\\.)*'", a)]
    values.append(''.join(chars))

assert len(names)==len(values), (len(names),len(values))
print('suffix entries:', len(names))

# --- HILO_ACCEL ---
m = re.search(r'HILO_ACCEL\s*=\s*new int\[\]\[\]\s*\{(.*)\};', acc, re.S)
blob = m.group(1)
rows = []
i = 0
toks = re.finditer(r'null|new int\[\]\s*\{([^}]*)\}', blob)
for t in toks:
    if t.group(0)=='null': rows.append(None)
    else: rows.append([int(x) for x in t.group(1).replace('\n',' ').split(',') if x.strip()])
print('accel rows:', len(rows))

full = {}
covered = [False]*len(names)
for second_code, row in enumerate(rows):
    if row is None: continue
    second = chr(second_code)
    for key, packed in enumerate(row):
        if packed == 0: continue
        first = chr(ord('A')+key) if key < 26 else chr(ord('a')+key-26)
        lo = packed & 0xFFFF; hi = packed >> 16
        for idx in range(lo, hi+1):
            nm = first + second + names[idx]
            assert nm not in full or full[nm]==values[idx]
            full[nm] = values[idx]
            covered[idx] = True
assert all(covered), covered.count(False)
print('full entities:', len(full))

# sanity spot checks
exp = {'amp;':'&','lt;':'<','gt;':'>','AElig;':'Æ','notin;':'∉','not':'¬','nbsp;':' '}
for k,v in exp.items():
    assert full.get(k)==v, (k, full.get(k), v)
print('spot checks OK')

with open('/root/repo/src/main/resources/graft/entities.tsv','w') as f:
    for nm in sorted(full):
        cps = ' '.join('%X'%ord(c) for c in full[nm])
        f.write(f'{nm}\t{cps}\n')
print('written')
