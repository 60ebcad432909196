"""HK protocol constants and vocabulary IRIs.

Mirrors /root/reference/constants.js, hk.js, rdfs.js, wikidata.js,
xmlschema.js (values are public vocabulary IRIs / the reference's documented
id scheme; see SURVEY.md §1.2).
"""

HK_PROTOCOL = "hk"
HK_ID_PREFIX = f"{HK_PROTOCOL}://id"
HK_NULL = f"{HK_ID_PREFIX}/null"           # constants.js:14
HK_NULL_URI = f"<{HK_NULL}>"               # parser.js:24

HK_ANCHOR_PREFIX = f"{HK_PROTOCOL}://a"
HK_BLANK_NODE_PREFIX = f"{HK_PROTOCOL}://b"
HK_REFERENCE_PREFIX = f"{HK_PROTOCOL}://ref"
HK_ROLE_PREFIX = f"{HK_PROTOCOL}://role"
HK_LINK_PREFIX = f"{HK_PROTOCOL}://link"
HK_NODE_PREFIX = f"{HK_PROTOCOL}://node"

DEFAULT_SUBJECT_ROLE = "subject"           # constants.js:9
DEFAULT_OBJECT_ROLE = "object"             # constants.js:10

# hklib entity-type tags (hklib Types, as serialized by the reference)
NODE = "node"
CONTEXT = "context"
LINK = "link"
CONNECTOR = "connector"
REFERENCE = "ref"
TRAIL = "trail"
VIRTUAL_NODE = "virtualnode"
VIRTUAL_CONTEXT = "virtualcontext"
VIRTUAL_LINK = "virtuallink"

# hklib ConnectorClass values (visible in generated SPARQL/test expectations)
HIERARCHY = "h"
FACTS = "f"

# hklib RoleTypes (serialized as literals "s"/"o", sparqlfactory.js:742-743)
ROLE_SUBJECT = "s"
ROLE_OBJECT = "o"
ROLE_CHILD = "c"
ROLE_PARENT = "p"

# hklib Constants.LAMBDA — "the whole entity" anchor (hkparser.js:24,370)
LAMBDA = "λ"

# --- vocabulary IRIs (angle-bracketed encodings, as the reference stores them)
RDF_TYPE_URI = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
RDFS_LABEL_URI = "<http://www.w3.org/2000/01/rdf-schema#label>"
RDFS_SUBCLASSOF_URI = "<http://www.w3.org/2000/01/rdf-schema#subClassOf>"
RDFS_SUBPROPERTYOF_URI = "<http://www.w3.org/2000/01/rdf-schema#subPropertyOf>"
WDT_INSTANCE_OF_URI = "<http://www.wikidata.org/prop/direct/P31>"
WDT_SUBCLASS_OF_URI = "<http://www.wikidata.org/prop/direct/P279>"

# default hierarchy connector predicates (parser.js:97)
DEFAULT_HIERARCHY_CONNECTOR_IDS = [
    RDF_TYPE_URI,
    RDFS_SUBCLASSOF_URI,
    RDFS_SUBPROPERTYOF_URI,
    WDT_INSTANCE_OF_URI,
    WDT_SUBCLASS_OF_URI,
]

# xmlschema.js
XSD_BOOLEAN_URI = "<http://www.w3.org/2001/XMLSchema#boolean>"
XSD_DECIMAL_URI = "<http://www.w3.org/2001/XMLSchema#decimal>"
XSD_DOUBLE_URI = "<http://www.w3.org/2001/XMLSchema#double>"
XSD_FLOAT_URI = "<http://www.w3.org/2001/XMLSchema#float>"
XSD_INTEGER_URI = "<http://www.w3.org/2001/XMLSchema#integer>"
XSD_NONNEGATIVEINTEGER_URI = "<http://www.w3.org/2001/XMLSchema#nonNegativeInteger>"
XSD_STRING_URI = "<http://www.w3.org/2001/XMLSchema#string>"

# literal→number conversion set (utils.js:24-29)
NUMBER_DATATYPES = [
    XSD_INTEGER_URI,
    XSD_NONNEGATIVEINTEGER_URI,
    XSD_DECIMAL_URI,
    XSD_DOUBLE_URI,
    XSD_FLOAT_URI,
]

# hk.js — HK graph vocabulary
HK_GRAPH_NS = "http://research.ibm.com/ontologies/graph#"
BODY_URI = f"<{HK_GRAPH_NS}body>"
CONNECTOR_URI = f"<{HK_GRAPH_NS}connector>"
CONTEXT_URI = f"<{HK_GRAPH_NS}context>"
NODE_URI = f"<{HK_GRAPH_NS}node>"
LINK_URI = f"<{HK_GRAPH_NS}link>"
REF_URI = f"<{HK_GRAPH_NS}ref>"
TRAIL_URI = f"<{HK_GRAPH_NS}trail>"
VIRTUAL_CONTEXT_URI = f"<{HK_GRAPH_NS}virtualcontext>"
VIRTUAL_NODE_URI = f"<{HK_GRAPH_NS}virtualnode>"
VIRTUAL_LINK_URI = f"<{HK_GRAPH_NS}virtuallink>"
BOUND_COMPONENT_URI = f"<{HK_GRAPH_NS}boundComponent>"
BOUND_ANCHOR_URI = f"<{HK_GRAPH_NS}boundAnchor>"
BOUND_ROLE_URI = f"<{HK_GRAPH_NS}boundRole>"
CLASSNAME_URI = f"<{HK_GRAPH_NS}className>"
HAS_BIND_URI = f"<{HK_GRAPH_NS}hasBind>"
HAS_PARENT_URI = f"<{HK_GRAPH_NS}hasParent>"
ISA_URI = f"<{HK_GRAPH_NS}isa>"
REFERENCES_URI = f"<{HK_GRAPH_NS}references>"
REFERENCED_BY_URI = f"<{HK_GRAPH_NS}referencedBy>"
USES_CONNECTOR_URI = f"<{HK_GRAPH_NS}usesConnector>"
HAS_ANCHOR_URI = f"<{HK_GRAPH_NS}hasAnchor>"
ANCHOR_KEY_URI = f"<{HK_GRAPH_NS}anchorKey>"
ANCHOR_TYPE_URI = f"<{HK_GRAPH_NS}anchorType>"
DATA_LIST_URI = "<http://research.ibm.com/ontologies/data#list>"
DATA_LITERAL_URI = "<http://research.ibm.com/ontologies/data#Literal>"
