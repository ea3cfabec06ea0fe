// Test-oracle stub for <gnuradio/attributes.h> (see tests/test_oracle_analog.py):
// just the visibility macros lora/api.h expects. No GNU Radio code involved.
#ifndef ORACLE_STUB_GR_ATTRIBUTES_H
#define ORACLE_STUB_GR_ATTRIBUTES_H
#define __GR_ATTR_EXPORT
#define __GR_ATTR_IMPORT
#endif
